from uk_housing_dashboard_etl_spark.plans.pipeline import HousingPipeline, PipelineConfig

__all__ = ["HousingPipeline", "PipelineConfig"]

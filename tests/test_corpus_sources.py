"""JSONL corpus reader (schema-enforced, corrupt-line quarantine) and
WebDataset-style tar shard reader (member explode + sample grouping)."""

from __future__ import annotations

import io
import json
import tarfile

from uk_housing_dashboard_etl_spark.sources.corpus import (
    read_jsonl_corpus,
    read_tar_shards,
    samples_from_members,
    split_corrupt,
)


def test_jsonl_read_and_quarantine(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en", "source": "a"}),
        json.dumps({"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "b"}),
        '{"doc_id": 3, "text": "broken',  # corrupt line
        json.dumps({"doc_id": 4, "text": None, "lang": "en", "source": "a"}),
    ]
    p.write_text("\n".join(lines))
    df = read_jsonl_corpus(spark, str(p))
    clean, bad = split_corrupt(df)
    got = clean.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [1, 2, 4]
    assert got.loc[0, "text"] == "hello world"
    assert bad.count() == 1
    assert "broken" in bad.collect()[0][0]


def _make_shard(path, samples):
    with tarfile.open(path, "w") as tf:
        for name, payload in samples:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))


def test_tar_shards_explode_and_group(spark, tmp_path):
    _make_shard(
        tmp_path / "shard-000.tar",
        [
            ("000001.jpg", b"\xff\xd8fakejpeg"),
            ("000001.txt", b"a caption"),
            ("000002.jpg", b"\xff\xd8other"),
        ],
    )
    _make_shard(
        tmp_path / "shard-001.tar",
        [("000003.jpg", b"x" * 100), ("000003.json", b'{"w": 1}')],
    )
    members = read_tar_shards(spark, str(tmp_path / "*.tar"))
    pdf = members.toPandas()
    assert len(pdf) == 5
    assert set(pdf["extension"]) == {"jpg", "txt", "json"}
    row = pdf[pdf.member_name == "000001.txt"].iloc[0]
    assert bytes(row["payload"]) == b"a caption"
    assert row["sample_key"] == "000001" and row["shard"] == "shard-000.tar"

    samples = samples_from_members(members).toPandas()
    assert len(samples) == 3
    s1 = samples[samples.sample_key == "000001"].iloc[0]
    assert s1["n_parts"] == 2
    assert set(s1["parts"].keys()) == {"jpg", "txt"}
    s3 = samples[samples.sample_key == "000003"].iloc[0]
    assert s3["total_bytes"] == 108


def test_tar_shard_write_read_roundtrip(spark, tmp_path):
    """write_tar_shards -> read_tar_shards -> samples_from_members
    reproduces the original samples byte-for-byte."""
    from pyspark.sql import functions as F

    from uk_housing_dashboard_etl_spark.sources.corpus import (
        read_tar_shards,
        samples_from_members,
        write_tar_shards,
    )

    rows = [
        (f"{i:06d}", {"txt": bytearray(f"doc {i}".encode()),
                      "bin": bytearray(bytes([i % 256]) * (i + 1))})
        for i in range(40)
    ]
    samples = spark.createDataFrame(
        rows, "sample_key: string, parts: map<string, binary>"
    )
    out = str(tmp_path / "shards")
    manifest = write_tar_shards(samples, out, n_shards=4).collect()
    assert sum(m.n_samples for m in manifest) == 40
    assert all(m.path.endswith(".tar") for m in manifest)

    # shard-K.tar must contain EXACTLY the keys with
    # abs(xxhash64(key)) % 4 == K, one manifest row per non-empty shard
    # (hash-partitioning co-locating two shard ids in one task must not
    # merge them into one tar)
    expected = {
        r.sample_key: r.shard
        for r in samples.select(
            "sample_key",
            (F.abs(F.xxhash64("sample_key")) % 4).cast("int").alias("shard"),
        ).collect()
    }
    assert len(manifest) == len(set(expected.values()))
    import tarfile as _tar
    seen = {}
    for m in manifest:
        with _tar.open(m.path) as tf:
            keys = {n.rsplit(".", 1)[0] for n in tf.getnames()}
        assert len(keys) == m.n_samples
        for k in keys:
            assert expected[k] == m.shard_id, (k, m.shard_id)
            seen[k] = m.shard_id
    assert seen.keys() == expected.keys()

    members = read_tar_shards(spark, out + "/*.tar")
    back = samples_from_members(members)
    assert back.count() == 40
    joined = (
        back.select("sample_key", F.explode("parts").alias("ext", "payload"))
        .join(
            samples.select(
                "sample_key", F.explode("parts").alias("ext", "orig")
            ),
            ["sample_key", "ext"],
        )
    )
    assert joined.count() == 80  # every (key, ext) pair survived
    assert joined.where("payload != orig").count() == 0  # bytes identical

    # deterministic: writing again produces identical shard bytes
    out2 = str(tmp_path / "shards2")
    write_tar_shards(samples, out2, n_shards=4).collect()
    import hashlib, os
    def digest(d):
        return {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
        }
    assert digest(out) == digest(out2)


def test_tar_shards_survive_contaminated_samples(spark, tmp_path):
    """r10 sweep fix: a NULL parts map / NULL key / NULL member used to
    kill the whole export task (sorted(None), bytes(None)). The writer
    now filters unexportable rows (documented) and skips NULL members;
    exportable samples in the same partition survive."""
    from uk_housing_dashboard_etl_spark.sources.corpus import (
        read_tar_shards,
        write_tar_shards,
    )

    samples = spark.createDataFrame(
        [
            ("a", {"txt": bytearray(b"x")}),
            ("b", None),                           # NULL parts: filtered
            (None, {"txt": bytearray(b"y")}),      # NULL key: filtered
            ("d", {"txt": None, "bin": bytearray(b"z")}),  # NULL member
        ],
        "sample_key string, parts map<string,binary>",
    )
    out = write_tar_shards(samples, str(tmp_path / "tars"), n_shards=2)
    assert sum(r.n_samples for r in out.collect()) == 2
    members = sorted(
        r[1] for r in read_tar_shards(spark, str(tmp_path / "tars"))
        .select("shard", "member_name").collect()
    )
    assert members == ["a.txt", "d.bin"]

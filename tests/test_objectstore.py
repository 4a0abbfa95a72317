"""S3/object-store contract tests — no network.

The seam under test: s3a conf assembly (reference io/s3_io.c:36-124
surface: explicit creds, env creds, MinIO endpoint + path-style) and
path normalization used by every source/sink. Actual bucket IO runs
wherever a real endpoint exists; these tests pin the contract so the
"works on object storage" claim is checked at the seam (COVERAGE A23).
"""

from __future__ import annotations

import pytest

from pg_lakehouse_spark import objectstore as obj
from pg_lakehouse_spark import sources


def test_explicit_credentials_conf():
    conf = obj.s3_conf(access_key="AK", secret_key="SK")
    assert conf["spark.hadoop.fs.s3a.access.key"] == "AK"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "SK"
    assert "spark.hadoop.fs.s3a.session.token" not in conf


def test_credentials_require_both():
    # reference s3_io.c:46-55: access_key and secret_key are required
    with pytest.raises(ValueError, match="required together"):
        obj.s3_conf(access_key="AK")


def test_session_token_switches_provider():
    conf = obj.s3_conf(access_key="AK", secret_key="SK", session_token="TOK")
    assert conf["spark.hadoop.fs.s3a.session.token"] == "TOK"
    assert "TemporaryAWSCredentialsProvider" in conf[
        "spark.hadoop.fs.s3a.aws.credentials.provider"
    ]


def test_env_credentials(monkeypatch):
    # reference s3_io.c:73-93: AWS_* env variables
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "EAK")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "ESK")
    monkeypatch.delenv("AWS_SESSION_TOKEN", raising=False)
    conf = obj.s3_conf(from_env=True)
    assert conf["spark.hadoop.fs.s3a.access.key"] == "EAK"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "ESK"


def test_env_credentials_missing(monkeypatch):
    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
    with pytest.raises(ValueError, match="not set"):
        obj.s3_conf(from_env=True)


def test_minio_endpoint_conf():
    # reference s3_io.c:95-124: custom endpoint + path-style for MinIO
    conf = obj.s3_conf(
        access_key="minioadmin",
        secret_key="minioadmin",
        endpoint="http://localhost:9000",
        path_style=True,
    )
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://localhost:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    # http endpoint ⇒ ssl off, inferred
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "false"


def test_https_endpoint_infers_ssl():
    conf = obj.s3_conf(endpoint="https://s3.eu-west-1.amazonaws.com", region="eu-west-1")
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "true"
    assert conf["spark.hadoop.fs.s3a.endpoint.region"] == "eu-west-1"


def test_scale_committer_defaults():
    conf = obj.s3_conf()
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert conf["spark.hadoop.fs.s3a.fast.upload"] == "true"


def test_conf_applies_to_session(spark):
    # the assembled keys are plain spark conf — settable on a live session
    for k, v in obj.s3_conf(access_key="AK", secret_key="SK").items():
        spark.conf.set(k, v)
    assert spark.conf.get("spark.hadoop.fs.s3a.access.key") == "AK"


def test_normalize_s3_schemes():
    assert obj.normalize_path("s3://b/k/f.parquet") == "s3a://b/k/f.parquet"
    assert obj.normalize_path("s3n://b/k") == "s3a://b/k"
    assert obj.normalize_path("s3a://b/k") == "s3a://b/k"


def test_normalize_other_schemes_untouched():
    for p in ("hdfs://nn/warehouse/t", "file:///tmp/x", "abfss://c@a.dfs.core.windows.net/p"):
        assert obj.normalize_path(p) == p


def test_normalize_local_absolutizes(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert obj.normalize_path("rel/dir") == str(tmp_path / "rel" / "dir")


def test_normalize_rejects_malformed():
    with pytest.raises(ValueError, match="malformed"):
        obj.normalize_path("s3:///no-bucket")


def test_bucket_key():
    assert obj.bucket_key("s3://bucket/a/b.parquet") == ("bucket", "a/b.parquet")
    assert obj.bucket_key("s3a://bucket") == ("bucket", "")
    with pytest.raises(ValueError):
        obj.bucket_key("/local/path")


def test_sources_normalize_before_load(spark, tmp_path, monkeypatch):
    """sources.read/write route through normalize_path: an s3:// URI
    reaches Spark as s3a:// (fails later on the missing connector, not
    on the scheme), and relative local paths absolutize."""
    df = spark.range(5)
    monkeypatch.chdir(tmp_path)
    sources.write(df, "rel_out", "parquet")
    assert (tmp_path / "rel_out").exists()
    back = sources.read(spark, "rel_out", "parquet")
    assert back.count() == 5

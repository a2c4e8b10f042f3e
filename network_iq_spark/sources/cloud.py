"""Cloud object-store sources (SURVEY.md §2.1 S11).

The reference documents an env-gated S3 CSV source (``NETWORKIQ_S3_PATH``,
README.md:191-193, read driver-side with boto3). The engine equivalent is a
plain ``spark.read`` against an ``s3a://`` path — the work is session
configuration, captured here so every job wires it identically. No network
I/O happens in this module; paths resolve lazily at scan time.
"""

from __future__ import annotations

import os


def s3a_conf(
    access_key: str | None = None,
    secret_key: str | None = None,
    endpoint: str | None = None,
) -> dict[str, str]:
    """Hadoop-AWS configs for ``s3a://`` scans (pass to ``get_spark``'s
    ``extra_conf``). Credentials default to the provider chain (env vars,
    instance profile) — explicit keys only for non-AWS endpoints."""
    conf = {
        "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
        # performance posture for columnar scans
        "spark.hadoop.fs.s3a.experimental.input.fadvise": "random",
        "spark.hadoop.fs.s3a.connection.maximum": "96",
    }
    if access_key and secret_key:
        conf["spark.hadoop.fs.s3a.access.key"] = access_key
        conf["spark.hadoop.fs.s3a.secret.key"] = secret_key
    if endpoint:
        conf["spark.hadoop.fs.s3a.endpoint"] = endpoint
        conf["spark.hadoop.fs.s3a.path.style.access"] = "true"
    return conf


def normalize_cloud_path(path: str) -> str:
    """``s3://`` → ``s3a://`` (the hadoop connector scheme); local and
    already-correct paths pass through."""
    if path.startswith("s3://"):
        return "s3a://" + path[len("s3://"):]
    return path


def env_source_path(env_var: str = "NETWORKIQ_S3_PATH", default: str | None = None) -> str | None:
    """The reference's env-gated source selection (S11), scheme-normalized."""
    raw = os.environ.get(env_var, default)
    return normalize_cloud_path(raw) if raw else None

"""S3 shard access (reference: egom2p/data/s3_utils.py:29-113).

The reference streams webdataset tars from S3 via boto3.  This environment
has zero network egress and no boto3, so the client is constructed lazily and
a clear error explains the situation; on a deployment with boto3 + credentials
the same code path streams shards exactly like the reference.
"""
from __future__ import annotations

import io
import os
from typing import Tuple


def is_s3_path(path: str) -> bool:
    return str(path).startswith("s3://")


def parse_s3_path(path: str) -> Tuple[str, str]:
    rest = path[len("s3://"):]
    bucket, _, key = rest.partition("/")
    if not bucket or not key:
        raise ValueError(f"malformed s3 path {path!r}")
    return bucket, key


def make_client(profile: str = None, endpoint_url: str = None):
    """boto3 S3 client (reference builds one per worker,
    s3_utils.py:29-56)."""
    try:
        import boto3
        session_cls = boto3.Session  # a stubbed/partial boto3 counts as
    except (ImportError, AttributeError) as e:  # absent (same clear error)
        raise RuntimeError(
            "s3:// paths need boto3 + network egress, neither of which this "
            "environment has. Mirror the shards to local disk (or any "
            "mounted filesystem) and point the data path there instead."
        ) from e
    session = (session_cls(profile_name=profile) if profile
               else session_cls())
    return session.client(
        "s3", endpoint_url=endpoint_url or os.environ.get("S3_ENDPOINT_URL"))


def open_stream(path: str, client=None):
    """Binary stream for a local file or an s3:// object.

    S3 objects come back as the botocore streaming body (non-seekable):
    callers should use tarfile's streaming mode ("r|*") for them."""
    if not is_s3_path(path):
        return open(path, "rb")
    client = client or make_client()
    bucket, key = parse_s3_path(path)
    return client.get_object(Bucket=bucket, Key=key)["Body"]


def download_to_memory(path: str, client=None) -> io.BytesIO:
    """Whole-object fetch (reference: s3_utils.py:96-113)."""
    body = open_stream(path, client)
    if isinstance(body, io.BufferedReader):
        data = body.read()
        body.close()
        return io.BytesIO(data)
    return io.BytesIO(body.read())

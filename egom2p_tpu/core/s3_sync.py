"""S3 checkpoint sync: upload-on-save + auto-download-on-resume.

TPU-native equivalent of the reference's S3 checkpoint loop
(reference: egom2p/utils/s3_utils.py:29-64 save_on_s3/download_from_s3,
egom2p/utils/checkpoint.py:113-120 upload after rank-0 save).  The
reference moves single ``.pth`` files; orbax checkpoints are directories,
so the unit of transfer here is "every file under checkpoint-{tag}/ with
its relative key".

No boto3 in this environment: the client comes from
egom2p_tpu.data.s3_utils.make_client (clear error without boto3), and every
function accepts an injected ``client`` so tests mock the transport
(tests/test_s3_sync.py).
"""
from __future__ import annotations

import os
import re
import threading
from typing import List, Optional, Tuple

from egom2p_tpu.data.s3_utils import make_client, parse_s3_path

_UPLOAD_THREADS: List[threading.Thread] = []


def upload_checkpoint(local_dir: str, s3_dir: str, client=None,
                      endpoint_url: Optional[str] = None) -> int:
    """Upload a checkpoint DIRECTORY to s3://.../<basename(local_dir)>/...

    Returns the number of files uploaded.  Rank-0-only by the caller
    (reference: checkpoint.py:96 'Only create the save_dict on the main
    process')."""
    client = client or make_client(endpoint_url=endpoint_url)
    bucket, prefix = parse_s3_path(
        s3_dir.rstrip("/") + "/" + os.path.basename(local_dir.rstrip("/")))
    n = 0
    for root, _, files in os.walk(local_dir):
        for f in sorted(files):
            full = os.path.join(root, f)
            rel = os.path.relpath(full, local_dir)
            client.upload_file(full, bucket, f"{prefix}/{rel}")
            n += 1
    return n


def download_checkpoint(s3_ckpt_dir: str, local_dir: str, client=None,
                        endpoint_url: Optional[str] = None) -> int:
    """Download s3://.../checkpoint-X/** into local_dir/ (created)."""
    client = client or make_client(endpoint_url=endpoint_url)
    bucket, prefix = parse_s3_path(s3_ckpt_dir.rstrip("/"))
    keys = _list_keys(client, bucket, prefix + "/")
    if not keys:
        raise FileNotFoundError(f"no objects under {s3_ckpt_dir}")
    for key in keys:
        rel = key[len(prefix) + 1:]
        dest = os.path.join(local_dir, rel)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        client.download_file(bucket, key, dest)
    return len(keys)


def latest_s3_checkpoint(s3_dir: str, client=None,
                         endpoint_url: Optional[str] = None) -> Optional[str]:
    """s3 path of the checkpoint-{N} with the largest N under s3_dir, falling
    back to checkpoint-final — mirrors core.checkpoint.latest_checkpoint."""
    client = client or make_client(endpoint_url=endpoint_url)
    bucket, prefix = parse_s3_path(s3_dir.rstrip("/"))
    names = set()
    for key in _list_keys(client, bucket, prefix + "/"):
        m = re.match(re.escape(prefix) + r"/(checkpoint-[^/]+)/", key)
        if m:
            names.add(m.group(1))
    best, best_n = None, -1
    for name in names:
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m and int(m.group(1)) > best_n:
            best, best_n = name, int(m.group(1))
    if best is None and "checkpoint-final" in names:
        best = "checkpoint-final"
    return f"s3://{bucket}/{prefix}/{best}" if best else None


def maybe_download_for_resume(output_dir: str, s3_dir: str, client=None,
                              endpoint_url: Optional[str] = None
                              ) -> Optional[str]:
    """Auto-resume assist: if output_dir has no local checkpoint but s3_dir
    has one, download the latest and return its local path (else None).
    Called before core.checkpoint.auto_load_model so a fresh machine resumes
    a run whose checkpoints live only in the bucket
    (reference resume flow: checkpoint.py:124-137 + download_from_s3)."""
    from egom2p_tpu.core.checkpoint import latest_checkpoint
    if latest_checkpoint(output_dir) is not None:
        return None  # local wins
    remote = latest_s3_checkpoint(s3_dir, client, endpoint_url)
    if remote is None:
        return None
    local = os.path.join(output_dir, remote.rsplit("/", 1)[1])
    download_checkpoint(remote, local, client, endpoint_url)
    return local


def upload_after_save(local_dir: str, s3_dir: str, blocking_save: bool,
                      client=None, endpoint_url: Optional[str] = None
                      ) -> None:
    """Upload hook for the trainer: synchronous after a blocking save; after
    an async save, a daemon thread first joins the in-flight orbax write
    (core.checkpoint.wait_for_saves) and then uploads, so the train loop
    keeps stepping through the whole disk-write + upload
    (the reference's save_on_s3 blocks the loop, s3_utils.py:29-41)."""
    if blocking_save:
        upload_checkpoint(local_dir, s3_dir, client, endpoint_url)
        return

    def run():
        from egom2p_tpu.core.checkpoint import wait_for_saves
        wait_for_saves()
        upload_checkpoint(local_dir, s3_dir, client, endpoint_url)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    _UPLOAD_THREADS.append(t)


def wait_for_uploads() -> None:
    """Join in-flight async uploads (call before process exit)."""
    while _UPLOAD_THREADS:
        _UPLOAD_THREADS.pop().join()


def _list_keys(client, bucket: str, prefix: str) -> List[str]:
    """All object keys under prefix (paginated; works with the mocked
    client, which returns plain dicts like botocore)."""
    keys: List[str] = []
    token = None
    while True:
        kw = dict(Bucket=bucket, Prefix=prefix)
        if token:
            kw["ContinuationToken"] = token
        resp = client.list_objects_v2(**kw)
        keys += [o["Key"] for o in resp.get("Contents", [])]
        if not resp.get("IsTruncated"):
            return sorted(keys)
        token = resp.get("NextContinuationToken")

"""S3 checkpoint round-trip with a mocked transport (round-4 VERDICT
missing item 3; reference: egom2p/utils/s3_utils.py:29-64 +
checkpoint.py:113-120).

The fake client implements the three botocore calls s3_sync uses
(upload_file / download_file / list_objects_v2) over an in-memory dict, so
the full save -> upload -> wipe local -> auto-download -> restore loop runs
without boto3 or network."""
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")


class FakeS3:
    """dict-backed stand-in for a boto3 S3 client (paginated listing)."""

    def __init__(self):
        self.store = {}

    def upload_file(self, filename, bucket, key):
        with open(filename, "rb") as f:
            self.store[(bucket, key)] = f.read()

    def download_file(self, bucket, key, filename, **kw):
        os.makedirs(os.path.dirname(filename), exist_ok=True)
        with open(filename, "wb") as f:
            f.write(self.store[(bucket, key)])

    def list_objects_v2(self, Bucket, Prefix, ContinuationToken=None):
        keys = sorted(k for (b, k) in self.store
                      if b == Bucket and k.startswith(Prefix))
        start = int(ContinuationToken) if ContinuationToken else 0
        page = keys[start:start + 2]  # tiny pages: exercise pagination
        trunc = start + 2 < len(keys)
        resp = {"Contents": [{"Key": k} for k in page], "IsTruncated": trunc}
        if trunc:
            resp["NextContinuationToken"] = str(start + 2)
        return resp


def _tree():
    return {"params": {"w": np.arange(12, dtype=np.float32).reshape(3, 4),
                       "b": np.ones((4,), np.float32)},
            "step": np.asarray(7, np.int32)}


def test_round_trip_upload_wipe_download_restore(tmp_path):
    import shutil

    from egom2p_tpu.core.checkpoint import (latest_checkpoint,
                                            load_checkpoint, save_checkpoint)
    from egom2p_tpu.core.s3_sync import (latest_s3_checkpoint,
                                         maybe_download_for_resume,
                                         upload_checkpoint)

    out = tmp_path / "run"
    s3 = FakeS3()
    s3_dir = "s3://ckpts/exp1"

    p3 = save_checkpoint(str(out), 3, _tree(), blocking=True)
    p5 = save_checkpoint(str(out), 5, _tree(), blocking=True)
    assert upload_checkpoint(p3, s3_dir, client=s3) > 0
    assert upload_checkpoint(p5, s3_dir, client=s3) > 0
    assert latest_s3_checkpoint(s3_dir, client=s3) == \
        "s3://ckpts/exp1/checkpoint-5"

    # wipe local state: a fresh machine resuming from the bucket
    shutil.rmtree(out)
    out.mkdir()
    assert latest_checkpoint(str(out)) is None
    fetched = maybe_download_for_resume(str(out), s3_dir, client=s3)
    assert fetched is not None and fetched.endswith("checkpoint-5")

    restored = load_checkpoint(fetched)
    np.testing.assert_array_equal(restored["params"]["w"],
                                  _tree()["params"]["w"])
    assert int(np.asarray(restored["step"])) == 7

    # local checkpoint present -> no download (local wins)
    assert maybe_download_for_resume(str(out), s3_dir, client=s3) is None


def test_upload_after_save_async_joins(tmp_path):
    from egom2p_tpu.core.checkpoint import save_checkpoint
    from egom2p_tpu.core.s3_sync import (upload_after_save, wait_for_uploads)

    s3 = FakeS3()
    path = save_checkpoint(str(tmp_path / "run"), "final", _tree(),
                           blocking=False)
    upload_after_save(path, "s3://ckpts/exp2", blocking_save=False, client=s3)
    wait_for_uploads()
    assert any(k.startswith("exp2/checkpoint-final/")
               for (_, k) in s3.store), sorted(s3.store)


def test_trainer_flags_accept_s3(tmp_path):
    """CLI surface: the reference's S3 save args parse."""
    import run_training_egom2p as T
    args = T.get_args(["--s3_save_dir", "s3://b/p", "--s3_endpoint",
                       "https://ep", "--output_dir", str(tmp_path)])
    assert args.s3_save_dir == "s3://b/p"

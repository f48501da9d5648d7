"""Multi-host seam coverage (VERDICT r2 #8): parallel/multihost.py env-var
fallbacks with a mocked jax.distributed.initialize, and per-process grain
shard disjointness with fake process counts — so the first real pod run
never debugs argument parsing or double-read data."""

import numpy as np
import pytest

from omr_a2s_multimodal_transformer_tpu.parallel import multihost


class _Recorder:
    def __init__(self):
        self.kwargs = None

    def __call__(self, **kwargs):
        self.kwargs = kwargs


@pytest.fixture()
def record_init(monkeypatch):
    import jax

    rec = _Recorder()
    monkeypatch.setattr(jax.distributed, "initialize", rec)
    for var in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    return rec


def test_initialize_no_args_autodetect(record_init):
    multihost.initialize()
    assert record_init.kwargs == {}  # TPU pods auto-detect


def test_initialize_explicit_args(record_init):
    multihost.initialize("10.0.0.1:1234", num_processes=4, process_id=2)
    assert record_init.kwargs == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 2,
    }


def test_initialize_env_fallbacks(record_init, monkeypatch):
    monkeypatch.setenv("COORDINATOR_ADDRESS", "host0:9000")
    monkeypatch.setenv("NUM_PROCESSES", "8")
    monkeypatch.setenv("PROCESS_ID", "3")
    multihost.initialize()
    assert record_init.kwargs == {
        "coordinator_address": "host0:9000",
        "num_processes": 8,
        "process_id": 3,
    }


def test_initialize_process_id_zero_env(record_init, monkeypatch):
    """PROCESS_ID=0 must be honored (falsy-string pitfall)."""
    monkeypatch.setenv("COORDINATOR_ADDRESS", "host0:9000")
    monkeypatch.setenv("NUM_PROCESSES", "2")
    monkeypatch.setenv("PROCESS_ID", "0")
    multihost.initialize()
    assert record_init.kwargs["process_id"] == 0


def test_initialize_explicit_overrides_env(record_init, monkeypatch):
    monkeypatch.setenv("COORDINATOR_ADDRESS", "env-host:1")
    multihost.initialize("arg-host:2")
    assert record_init.kwargs["coordinator_address"] == "arg-host:2"


def test_is_primary(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    assert multihost.is_primary()
    monkeypatch.setattr(jax, "process_index", lambda: 3)
    assert not multihost.is_primary()


# ------------------------------------------------------------- grain sharding


def _fake_process(monkeypatch, idx: int, count: int):
    import jax

    monkeypatch.setattr(jax, "process_index", lambda: idx)
    monkeypatch.setattr(jax, "process_count", lambda: count)


@pytest.mark.parametrize("n_proc", [2, 4])
def test_shard_by_jax_process_disjoint_cover(monkeypatch, n_proc):
    """ShardByJaxProcess under fake process counts: the index streams of
    the processes are pairwise disjoint and their union covers the
    drop_remainder-truncated record range — no sample is read twice or
    silently trained on by two hosts."""
    pg = pytest.importorskip("grain.python")
    n_records = 41  # deliberately not divisible by n_proc
    per_proc = []
    for i in range(n_proc):
        _fake_process(monkeypatch, i, n_proc)
        sampler = pg.IndexSampler(
            num_records=n_records,
            shard_options=pg.ShardByJaxProcess(drop_remainder=True),
            shuffle=True,
            num_epochs=1,
            seed=0,
        )
        ids = []
        k = 0
        while True:
            try:
                ids.append(int(sampler[k].record_key))
            except IndexError:
                break
            k += 1
        per_proc.append(set(ids))
    union = set().union(*per_proc)
    total = sum(len(s) for s in per_proc)
    assert total == len(union), "processes share record keys (double read)"
    assert len(union) >= (n_records // n_proc) * n_proc - n_proc + 1
    assert union <= set(range(n_records))
    sizes = {len(s) for s in per_proc}
    assert len(sizes) == 1, f"unbalanced shards: {sizes}"


def test_grain_loader_shards_by_process(monkeypatch):
    """GrainLoader(shard_by_process=True) under a fake 2-process world:
    each process sees half the (deterministic synthetic) samples, and the
    two halves are disjoint by transcript content."""
    pytest.importorskip("grain.python")
    from omr_a2s_multimodal_transformer_tpu.data.dataset import ARDataset
    from omr_a2s_multimodal_transformer_tpu.data.grain_pipeline import GrainLoader

    ds = ARDataset(
        "synthetic", "train", "kern", "image", synthetic=True,
        synthetic_kwargs=dict(n=8, img_height_range=(32, 33), img_width_range=(50, 90),
                              n_measures=2),
    )
    seen = []
    for i in range(2):
        _fake_process(monkeypatch, i, 2)
        gl = GrainLoader(ds, batch_size=2, shuffle=False, seed=0, num_workers=0,
                         shard_by_process=True)
        ys = []
        for batch in gl:
            for row in np.asarray(batch["y_out"]):
                ys.append(tuple(int(t) for t in row))
        seen.append(ys)
    assert len(seen[0]) == len(seen[1]) == 4  # 8 samples, 2 shards
    assert not (set(seen[0]) & set(seen[1])), "shards overlap"

"""Utility tests: cut_at_eos, metrics, logging, debug checks."""

import jax
import jax.numpy as jnp
import numpy as np

from omr_a2s_multimodal_transformer_tpu.training.decode import cut_at_eos
from omr_a2s_multimodal_transformer_tpu.utils.debug import checked
from omr_a2s_multimodal_transformer_tpu.utils.logging import MetricsLogger
from omr_a2s_multimodal_transformer_tpu.utils.metrics import compute_ed_metrics, compute_metrics


def test_cut_at_eos_includes_eos():
    toks = np.asarray([[5, 9, 2, 7, 7], [3, 3, 3, 3, 3]])
    scores = np.asarray([[0.1, 0.2, 0.3, 0.4, 0.5]] * 2)
    t, s = cut_at_eos(toks, scores, eos_id=2)
    assert t[0] == [5, 9, 2]  # cut right AFTER eos (reference includes it)
    assert s[0] == [0.1, 0.2, 0.3]
    assert t[1] == [3, 3, 3, 3, 3]  # no eos -> full length


def test_ed_metrics_reference_formulas():
    y_true = [list("abc"), list("abcd")]
    y_pred = [list("abc"), list("abXd")]
    m = compute_ed_metrics(y_true, y_pred)
    # sym-er = 100 * (0 + 1) / (3 + 4); seq-er = 100 * 1/2
    assert abs(m["sym-er"] - 100.0 / 7.0) < 1e-9
    assert m["seq-er"] == 50.0


def test_compute_metrics_without_mv2h():
    m = compute_metrics([list("ab")], [list("ab")])
    assert m == {"sym-er": 0.0, "seq-er": 0.0}


def test_metrics_logger_jsonl(tmp_path):
    log = MetricsLogger(str(tmp_path))
    log.log({"train_loss": 1.5}, step=1, quiet=True)
    log.close()
    import json

    lines = [json.loads(ln) for ln in open(log.path)]
    assert lines[-1]["train_loss"] == 1.5 and lines[-1]["step"] == 1


def test_checked_catches_nan():
    f = checked(jax.jit(lambda x: jnp.log(x).sum()))
    assert np.isfinite(float(f(jnp.ones(4))))
    try:
        f(jnp.zeros(4) - 1.0)  # log of negative -> nan
        raised = False
    except Exception:
        raised = True
    assert raised

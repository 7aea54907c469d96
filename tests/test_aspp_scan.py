"""Parity of the scan-serialized ASPP path (MADM_ASPP_SCAN=1) vs the
module path: identical variable trees, matching outputs, grads and
BN running-stat updates.

The scan path exists for train memory (one branch's backward live at a
time on 16GB v5e — see ``sep_branch_scan``); it must be numerically the
module graph re-expressed (fp32: equal up to reassociation of the
9-tap depthwise sum vs the conv lowering).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madm_tpu.models.daformer import ASPPWrapper


@pytest.fixture()
def data():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 24, 32))
    m = ASPPWrapper(16, dilations=(1, 6, 12, 18), remat=True)
    v = m.init(jax.random.PRNGKey(0), x, True)
    return m, v, x


def _run(m, v, x, scan: bool, monkeypatch, impl: str = "taps"):
    monkeypatch.setenv("MADM_ASPP_SCAN", "1" if scan else "0")
    monkeypatch.setenv("MADM_ASPP_SCAN_IMPL", impl)

    def loss(params):
        out, mut = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, True, mutable=["batch_stats"],
        )
        return (out.astype(jnp.float32) ** 2).mean(), (out, mut["batch_stats"])

    (l, (out, bn)), grads = jax.value_and_grad(loss, has_aux=True)(v["params"])
    return l, out, bn, grads


def test_scan_variable_tree_identical(data, monkeypatch):
    m, v, x = data
    monkeypatch.setenv("MADM_ASPP_SCAN", "1")
    v_scan = m.init(jax.random.PRNGKey(0), x, True)
    monkeypatch.setenv("MADM_ASPP_SCAN", "0")
    flat_a = jax.tree_util.tree_flatten_with_path(v)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(v_scan)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (pa, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


@pytest.mark.parametrize("impl", ["taps", "conv"])
def test_scan_matches_module_path(data, monkeypatch, impl):
    m, v, x = data
    l0, out0, bn0, g0 = _run(m, v, x, scan=False, monkeypatch=monkeypatch)
    l1, out1, bn1, g1 = _run(m, v, x, scan=True, monkeypatch=monkeypatch,
                             impl=impl)
    np.testing.assert_allclose(l1, l0, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=2e-4, atol=2e-5)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(bn0)[0],
        jax.tree_util.tree_flatten_with_path(bn1)[0],
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-6, err_msg=str(pa))
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g0)[0],
        jax.tree_util.tree_flatten_with_path(g1)[0],
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-6, err_msg=str(pa))


def test_scan_eval_mode_unaffected(data, monkeypatch):
    m, v, x = data
    monkeypatch.setenv("MADM_ASPP_SCAN", "1")
    out_flag = m.apply(v, x, False)
    monkeypatch.setenv("MADM_ASPP_SCAN", "0")
    out_base = m.apply(v, x, False)
    np.testing.assert_array_equal(np.asarray(out_flag), np.asarray(out_base))

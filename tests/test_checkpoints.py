"""Checkpoint subsystem: LoRA merge math, DDP prefix strip, orbax round-trip."""
import numpy as np
import pytest
import jax.numpy as jnp

from imagine360_tpu.utils.convert import merge_lora, strip_prefix


def test_strip_prefix():
    st = {"module.a.weight": 1, "b.bias": 2}
    out = strip_prefix(st)
    assert set(out) == {"a.weight", "b.bias"}


def test_merge_lora_math():
    torch = pytest.importorskip("torch")
    w = torch.randn(8, 6)
    up = torch.randn(8, 4)
    down = torch.randn(4, 6)
    state = {"blk.to_q.weight": w}
    lora = {"blk.to_q.lora.up.weight": up, "blk.to_q.lora.down.weight": down}
    merged = merge_lora(state, lora, alpha=0.5)
    expected = w.numpy() + 0.5 * (up.numpy() @ down.numpy())
    np.testing.assert_allclose(merged["blk.to_q.weight"], expected,
                               atol=1e-6)


def test_orbax_roundtrip(tmp_path):
    from imagine360_tpu.utils.checkpoints import save_orbax, load_orbax
    tree = {"params": {"layer": {"kernel": jnp.arange(6.0).reshape(2, 3),
                                 "bias": jnp.zeros(3)}}}
    path = str(tmp_path / "ckpt")
    save_orbax(tree, path)
    restored = load_orbax(path, target=tree)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["layer"]["kernel"]),
        np.asarray(tree["params"]["layer"]["kernel"]))

"""Checkpoint / resume: npz field round-trips and orbax sharded trees."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastbox_tpu.io import load_fields, load_sharded, save_fields, save_sharded


def test_save_load_fields_roundtrip(tmp_path):
    path = str(tmp_path / "fields.npz")
    a = jnp.arange(8.0).reshape(2, 4)
    c = jnp.arange(4.0) + 1j * jnp.arange(4.0)
    save_fields(path, a=a, c=c, skipped=None)
    got = load_fields(path)
    assert set(got) == {"a", "c"}
    np.testing.assert_array_equal(np.asarray(got["a"]), np.asarray(a))
    np.testing.assert_array_equal(np.asarray(got["c"]), np.asarray(c))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_save_load_sharded_roundtrip(tmp_path):
    """Orbax sharded checkpoint: save a slab-sharded cube + scalar tree,
    restore onto the same sharding, bit-exact, sharding preserved."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("space",))
    sh = NamedSharding(mesh, P("space"))
    x = jax.device_put(jnp.arange(16.0 * 4 * 4).reshape(16, 4, 4), sh)
    tree = {"delta": x, "steps": jnp.asarray(16)}

    path = str(tmp_path / "ckpt")
    save_sharded(path, tree)
    got = load_sharded(path, tree)
    np.testing.assert_array_equal(np.asarray(got["delta"]), np.asarray(x))
    assert got["delta"].sharding.is_equivalent_to(sh, x.ndim)
    assert int(got["steps"]) == 16

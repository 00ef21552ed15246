"""Runtime type checking with jaxtyping+typeguard actually enabled
(SURVEY.md §5.2 — the reference imports but never applies it)."""

import jax.numpy as jnp
import numpy as np
import pytest

from worldrenderer_tpu.utils import typing as wt


@pytest.mark.skipif(not wt.HAS_JAXTYPING, reason="jaxtyping unavailable")
def test_jaxtyped_annotations_enforced():
    typeguard = pytest.importorskip("typeguard")
    from jaxtyping import Float, jaxtyped

    @jaxtyped(typechecker=typeguard.typechecked)
    def transform(points: Float[jnp.ndarray, "n 3"]) -> Float[jnp.ndarray, "n 3"]:
        return points * 2.0

    ok = transform(jnp.ones((5, 3)))
    assert ok.shape == (5, 3)

    with pytest.raises(Exception):
        transform(jnp.ones((5, 2)))  # wrong trailing dim

    with pytest.raises(Exception):
        transform(jnp.ones((5, 3), dtype=jnp.int32))  # wrong dtype


def test_check_finite_passes_and_fails():
    from jax.experimental import checkify

    from worldrenderer_tpu.utils.debug import check_finite

    def f(x):
        return check_finite(x, "x")

    checked = checkify.checkify(f)
    err, _ = checked(jnp.ones(3))
    err.throw()  # no error

    err, _ = checked(jnp.array([1.0, jnp.nan]))
    with pytest.raises(Exception):
        err.throw()

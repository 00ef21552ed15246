"""Spike: manual double-buffered DMA from an ANY-space ref with dynamic
chunk offsets (scalar-prefetched), plus (1, P) -> (th, tw) output reshape.
Run on CPU (interpret) and on TPU to validate both paths."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(start_ref, nch_ref, x_hbm, out_ref, buf, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)
    base = start_ref[b, i]
    nch = nch_ref[b, i]
    c = buf.shape[2]
    th, tw = out_ref.shape[1], out_ref.shape[2]
    p = th * tw

    def dma(slot, ci):
        return pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds((base + ci) * c, c)],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(nch > 0)
    def _():
        dma(0, 0).start()

    def body(ci, acc):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < nch)
        def _():
            dma(1 - slot, ci + 1).start()

        dma(slot, ci).wait()
        v = buf[slot]  # (8, c)
        return acc + jnp.sum(v)

    acc = jax.lax.fori_loop(0, nch, body, jnp.float32(0.0))
    row = jnp.full((1, p), acc, jnp.float32) + jax.lax.broadcasted_iota(
        jnp.int32, (1, p), 1
    ).astype(jnp.float32)
    out_ref[0, :, :] = row.reshape(th, tw)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def run(x, starts, nch, n_tiles, th, tw, interpret):
    bsz = x.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(
                (1, th, tw), lambda b, i, s, n: (b, i, 0), memory_space=pltpu.VMEM
            )
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bsz, n_tiles * th, tw), jnp.float32)],
        interpret=interpret,
    )(starts, nch, x)[0]


def main():
    bsz, n_tiles, c = 2, 4, 128
    th, tw = 16, 128
    L = 8 * c
    x = jnp.arange(bsz * 8 * L, dtype=jnp.float32).reshape(bsz, 8, L) * 1e-4
    starts = jnp.array([[0, 2, 4, 6], [1, 3, 5, 7]], jnp.int32)
    nch = jnp.array([[2, 2, 2, 0], [1, 1, 1, 1]], jnp.int32)
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = run(x, starts, nch, n_tiles, th, tw, interpret)
    out = np.asarray(out)

    # Reference
    xr = np.asarray(x)
    for b in range(bsz):
        for i in range(n_tiles):
            acc = 0.0
            for ci in range(int(nch[b, i])):
                s = (int(starts[b, i]) + ci) * c
                acc += xr[b, :, s : s + c].sum(dtype=np.float32)
            ref = acc + np.arange(th * tw, dtype=np.float32).reshape(th, tw)
            got = out[b, i * th : (i + 1) * th]
            np.testing.assert_allclose(got, ref, rtol=1e-5)
    print(f"spike_dma OK on {jax.default_backend()} (interpret={interpret})")


if __name__ == "__main__":
    main()

"""Bisect which section of the runs-batched frame kernel crashes Mosaic at R>1.

Compiles truncated versions of the kernel body (stage 1..N) on the real
backend. Usage: python tools/rb_bisect.py [R]
"""

import functools
import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from vae_equalizer_tpu.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

R = int(sys.argv[1]) if len(sys.argv) > 1 else 2
M, N, NLEV = 25, 100, 8
MH, MHE = M // 2, M // 2 + 1
NE = N - MH
_HI = jax.lax.Precision.HIGHEST


def _bdot(a, b, contract=((2,), (1,))):
    return jax.lax.dot_general(
        a, b, (contract, ((0,), (0,))), preferred_element_type=jnp.float32,
        precision=_HI)


def kern(stage, xi_ref, amps_ref, maske_ref, w_ref, h_ref, o_ref,
         q_sc, eqwin_e_sc, ct_e_sc, gdwin_e_sc):
    ampc = jnp.transpose(amps_ref[...])[None]
    amp2c = ampc * ampc
    xi = xi_ref[...]
    w = w_ref[...]
    h_e = h_ref[:, :, :MHE]

    out_i = _bdot(w, xi)  # (R, 2, N)
    out = jnp.concatenate([out_i, out_i * 0.5], axis=1)  # (R, 4, N)
    acc = jnp.sum(out, axis=(1, 2), keepdims=True)
    if stage >= 2:  # demapper
        eqs = []
        for r in range(4):
            o = out[:, r : r + 1, :]
            dlt = o - ampc
            metric = dlt * dlt * 0.5 + 0.1 * amp2c
            mmin = jnp.min(metric, axis=1, keepdims=True)
            e = jnp.exp(mmin - metric)
            q = e / jnp.sum(e, axis=1, keepdims=True)
            q_sc[:, r * NLEV : (r + 1) * NLEV, :] = q
            eqs.append(jnp.sum(ampc * q, axis=1, keepdims=True))
        eq4 = jnp.concatenate(eqs, axis=1)
        acc += jnp.sum(eq4, axis=(1, 2), keepdims=True)
    if stage >= 3:  # win_stack
        r = 0
        for g in (0, 2, 1, 3):
            for a in range(MHE):
                eqwin_e_sc[:, r : r + 1, :] = eq4[:, g : g + 1, MH - a : N - a]
                r += 1
        eqwin_e = eqwin_e_sc[...]
        acc += jnp.sum(eqwin_e, axis=(1, 2), keepdims=True)
    if stage >= 4:  # ct_d assembly
        for chi in range(2):
            hr0 = h_e[:, chi * 4 : chi * 4 + 1, :]
            hi0 = h_e[:, chi * 4 + 1 : chi * 4 + 2, :]
            hr1 = h_e[:, chi * 4 + 2 : chi * 4 + 3, :]
            hi1 = h_e[:, chi * 4 + 3 : chi * 4 + 4, :]
            for b, blk in enumerate((hr0, -hi0, hr1, -hi1)):
                ct_e_sc[:, chi * 2 : chi * 2 + 1, b * MHE : (b + 1) * MHE] = blk
            for b, blk in enumerate((hi0, hr0, hi1, hr1)):
                ct_e_sc[:, chi * 2 + 1 : chi * 2 + 2, b * MHE : (b + 1) * MHE] = blk
        ct = ct_e_sc[...]
        acc += jnp.sum(ct, axis=(1, 2), keepdims=True)
    if stage >= 5:  # D matmul
        d_e = _bdot(ct, eqwin_e)  # (R, 4, NE)
        acc += jnp.sum(d_e, axis=(1, 2), keepdims=True)
    if stage >= 6:  # E term with broadcast masks
        mask_e3 = jnp.zeros((R, 1, 1), jnp.float32) + maske_ref[...]
        s_e = _bdot(eq4, mask_e3)
        acc += jnp.sum(s_e, axis=(1, 2), keepdims=True)
    if stage >= 7:  # gh-style transposed-contraction matmul
        gh_e_m = _bdot(d_e, eqwin_e, ((2,), (2,)))
        acc += jnp.sum(gh_e_m, axis=(1, 2), keepdims=True)
    if stage >= 8:  # gdwin: pad + window stores
        padded = jnp.pad(d_e, ((0, 0), (0, 0), (MH, MHE - 1)))
        r = 0
        for g in range(4):
            for a in range(MHE):
                gdwin_e_sc[:, r : r + 1, :] = padded[:, g : g + 1, a : a + N]
                r += 1
        acc += jnp.sum(gdwin_e_sc[...], axis=(1, 2), keepdims=True)
    if stage >= 9:  # concat of (R,2,1) with scalar broadcast (gfac pattern)
        g_cx = 1.0 / acc  # (R, 1, 1)
        zer2 = jnp.zeros((R, 2, 1), jnp.float32)
        gfac = jnp.concatenate([zer2 + g_cx, zer2 + 2.0 * g_cx], axis=1)
        acc += jnp.sum(gfac * d_e[:, :, :1], axis=(1, 2), keepdims=True)
    if stage >= 10:  # stats row: concat + pad lanes
        row = jnp.concatenate([acc, acc, acc], axis=2)
        padrow = jnp.pad(row, ((0, 0), (0, 0), (0, 125)))
        acc += jnp.sum(padrow, axis=(1, 2), keepdims=True)

    o_ref[...] = jnp.zeros((R, 8, 128), jnp.float32) + acc


def try_stage(stage):
    xi = jnp.ones((R, 4 * M, N), jnp.float32) * 0.01
    amps = jnp.ones((1, NLEV), jnp.float32)
    maske = jnp.ones((N, MHE), jnp.float32)
    w = jnp.ones((R, 2, 4 * M), jnp.float32) * 0.01
    h = jnp.ones((R, 8, M), jnp.float32) * 0.1
    f = pl.pallas_call(
        functools.partial(kern, stage),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((R, 4 * NLEV, N), jnp.float32),
            pltpu.VMEM((R, 4 * MHE, NE), jnp.float32),
            pltpu.VMEM((R, 4, 4 * MHE), jnp.float32),
            pltpu.VMEM((R, 4 * MHE, N), jnp.float32),
        ],
    )
    try:
        out = jax.block_until_ready(f(xi, amps, maske, w, h))
        print(f"  stage {stage:2d}: OK   ({float(np.asarray(out)[0,0,0]):.3f})")
        return True
    except Exception as e:
        print(f"  stage {stage:2d}: FAIL {str(e).splitlines()[0][:100]}")
        return False


if __name__ == "__main__":
    print(f"R={R}")
    for s in range(1, 11):
        if not try_stage(s):
            break

"""Phase attribution for the merging general tail on NaN-masked fields.

The r4 NaN bench (BENCH_NANFRAC=0.1, 4096²) measured 187 Mpix/s vs 1878
dense — a 10x collapse.  This probe splits the e2e merging time into
(a) the relax fixed point alone (fwd_scan='stats', no tail),
(b) relax + component_min_from_padded (the production general tail),
and counts the tail's violation-loop rounds, at a configurable NaN
fraction.  Run on the TPU: python tools/probe_nan_tail.py [size [frac]].
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rustronomy_watershed_tpu.ops.level_driver import run_levels_impl
    from rustronomy_watershed_tpu.ops.pallas_relax import relax_packed_planes

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    inner = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    rng = np.random.default_rng(0)
    img = rng.integers(0, 254, size=(size, size)).astype(np.uint8)
    if frac > 0:
        img[rng.random((size, size)) < frac] = 255
    img_d = jax.device_put(jnp.asarray(img))
    jax.block_until_ready(img_d)

    def timeit(name, fn):
        chk = int(fn(img_d))  # compile+warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            c = int(fn(img_d))
            ts.append(time.perf_counter() - t0)
            assert c == chk
        dt = min(ts) / inner
        print(f"{name}: {dt*1e3:.2f} ms/iter ({size*size/dt/1e6:.0f} Mpix/s)",
              flush=True)
        return dt

    @partial(jax.jit, static_argnames=())
    def relax_only(im):
        def body(i, acc):
            salt = jnp.where(acc == jnp.int32(-1), 1, 0).astype(im.dtype)
            out = relax_packed_planes(im + salt, None, fwd_scan="stats")
            return acc ^ jnp.sum(out[1].astype(jnp.int32))
        return jax.lax.fori_loop(0, inner, body, jnp.int32(0))

    @jax.jit
    def e2e(im):
        def body(i, acc):
            salt = jnp.where(acc == jnp.int32(-1), 1, 0).astype(im.dtype)
            out = run_levels_impl(
                (im + salt).astype(jnp.int32), None, n_labels=2,
                max_water_level=254, merging=True, backend="relax_pallas",
            )
            return acc ^ jnp.sum(out.astype(jnp.int32))
        return jax.lax.fori_loop(0, inner, body, jnp.int32(0))

    if os.environ.get("PROBE_COUNT_ONLY", "0") != "1":
        t_r = timeit("relax only (fwd='stats')", relax_only)
        t_e = timeit("e2e merging (general tail)", e2e)
        print(f"tail share: {(t_e - t_r)*1e3:.2f} ms", flush=True)

    # Count the violation-loop rounds of BOTH tails by stepping them
    # eagerly (one dispatch per pass — only the COUNTs matter here).
    from rustronomy_watershed_tpu.ops import scan_merge as sm

    out = relax_packed_planes(img_d, None, fwd_scan="stats")
    lab_pad = out[1]
    p, col_off, _tile = out[2], out[3], out[4]
    h, w = size, size
    hp, wp = lab_pad.shape
    h2 = hp - 2 * p
    tl = sm._tail_tile(h2) if h2 % 8 == 0 else _tile
    col_lo, col_hi = col_off, col_off + w - 1
    y = sm._call_round_kernel(
        sm._fwd_v_kernel, lab_pad, tile=tl, interpret=False, out_rows=h2,
        col_lo=col_lo, col_hi=col_hi, row_off=p, always_write=True,
    )[0]
    rounds = 0
    while True:
        y, viol = sm._call_round_kernel(
            sm._bwd_vh_kernel, y, tile=tl, interpret=False,
            real_h=h, col_lo=col_lo, col_hi=col_hi,
        )
        rounds += 1
        if not bool(viol):
            break
        y = sm._call_round_kernel(
            sm._fwd_v_kernel, y, tile=tl, interpret=False,
            col_lo=col_lo, col_hi=col_hi,
        )[0]
        if rounds > 2000:
            print("rounds > 2000, aborting count", flush=True)
            break
    print(f"FINE tail rounds to fixed point: {rounds}", flush=True)

    if h2 % 16 == 0:
        # Coarse-engine round count (the production general tail, r11):
        # replicate component_min_coarse_from_padded's loop eagerly.
        hc = h2 // 2
        tc = sm._tail_tile(hc)
        import jax as _jax
        from jax.experimental import pallas as _pl
        from jax.experimental.pallas import tpu as _pltpu
        from functools import partial as _partial

        grid_spec = _pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(hc // tc,),
            in_specs=[_pl.BlockSpec(memory_space=_pl.ANY)],
            out_specs=[
                _pl.BlockSpec(memory_space=_pl.ANY),
                _pl.BlockSpec(
                    (1, 1), lambda i: (0, 0), memory_space=_pltpu.SMEM
                ),
            ],
            scratch_shapes=[
                _pltpu.VMEM((2, 2 * tc + 16, wp), jnp.int32),
                _pltpu.VMEM((tc, wp), jnp.int32),
                _pltpu.VMEM((1, wp), jnp.int32),
                _pltpu.VMEM((1, wp), jnp.int32),
                _pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        c, _ = _pl.pallas_call(
            _partial(
                sm._coarsen_kernel, tile=tc, p=p, real_h=h,
                col_lo=col_lo, col_hi=col_hi,
            ),
            grid_spec=grid_spec,
            out_shape=[
                _jax.ShapeDtypeStruct((hc, wp), jnp.int32),
                _jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ],
            compiler_params=_pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024
            ),
        )(lab_pad)
        c = sm._call_round_kernel(
            sm._cfwd_v_kernel, c, tile=tc, interpret=False
        )[0]
        crounds = 0
        while True:
            c, viol = sm._call_round_kernel(
                sm._cbwd_vh_kernel, c, tile=tc, interpret=False
            )
            crounds += 1
            if not bool(viol):
                break
            c = sm._call_round_kernel(
                sm._cfwd_v_kernel, c, tile=tc, interpret=False
            )[0]
            if crounds > 2000:
                print("coarse rounds > 2000, aborting count", flush=True)
                break
        print(f"COARSE tail rounds to fixed point: {crounds}", flush=True)

        # Multi-iteration engine round count (r12): coarsen with the 8-row
        # apron, then drive _call_multi_kernel rounds eagerly with the
        # production schedule (round 0 up+full_h, then alternating).
        cm, _ = _pl.pallas_call(
            _partial(
                sm._coarsen_kernel, tile=tc, p=p, real_h=h,
                col_lo=col_lo, col_hi=col_hi, out_off=8,
            ),
            grid_spec=grid_spec,
            out_shape=[
                _jax.ShapeDtypeStruct((hc + 16, wp), jnp.int32),
                _jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ],
            compiler_params=_pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024
            ),
        )(lab_pad)
        tm = sm._multi_tile(hc)
        mrounds = 0
        while True:
            cm, viol = sm._call_multi_kernel(
                cm, tile=tm, k=sm._COARSE_K,
                up=(mrounds == 0 or mrounds % 2 == 0),
                full_h=(mrounds == 0), h_window=sm._COARSE_HWIN,
                interpret=False,
            )
            mrounds += 1
            if not bool(viol):
                break
            if mrounds > 2000:
                print("multi rounds > 2000, aborting count", flush=True)
                break
        print(
            f"MULTI tail rounds to fixed point: {mrounds} "
            f"(k={sm._COARSE_K}, tile={tm})",
            flush=True,
        )


if __name__ == "__main__":
    sys.exit(main())

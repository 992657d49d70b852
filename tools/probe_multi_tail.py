"""Time the coarse merging tail alone across engine configs (r12 tuning).

Runs the relax fixed point ONCE to get the padded label plane, then times
jitted invocations of component_min_coarse_from_padded under different
(engine, k, tile) configurations by monkeypatching the module constants
before each trace.  Inner-loop amortised like bench.py (serially-dependent
fori_loop) so the ~26 ms tunnel dispatch washes out.

Usage: python tools/probe_multi_tail.py [size [frac [shape]]]
  shape: dots | blobs
Configs via RWT_PROBE_CONFIGS="legacy,multi:k=2,multi:k=3:tile=64" etc.
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

    import rustronomy_watershed_tpu.ops.scan_merge as sm
    from rustronomy_watershed_tpu.ops.pallas_relax import relax_packed_planes

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    shape = sys.argv[3] if len(sys.argv) > 3 else "dots"
    rng = np.random.default_rng(0)
    img = rng.integers(0, 254, size=(size, size)).astype(np.uint8)
    if shape == "dots":
        img[rng.random((size, size)) < frac] = 255
    else:
        yy, xx = np.mgrid[0:size, 0:size]
        mask = np.zeros((size, size), dtype=bool)
        r_mean = size * np.sqrt(frac / (8 * np.pi))
        for _ in range(8):
            cy, cx = rng.integers(0, size, 2)
            ry, rx = rng.uniform(0.5, 1.5, 2) * r_mean
            mask |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1
        img[mask] = 255

    img_d = jax.device_put(jnp.asarray(img))
    out = relax_packed_planes(img_d, None, fwd_scan="stats")
    lab_pad, p, col_off = out[1], out[2], out[3]
    lab_pad = jax.block_until_ready(lab_pad)
    h2 = lab_pad.shape[0] - 2 * p
    print(f"{shape} {size}² frac={frac}: lab_pad {lab_pad.shape}, h2={h2}")

    configs = os.environ.get(
        "RWT_PROBE_CONFIGS", "legacy,multi:k=1,multi:k=2,multi:k=3"
    ).split(",")
    inner = int(os.environ.get("RWT_PROBE_INNER", "8"))

    for cfg in configs:
        parts = cfg.split(":")
        if parts[0] == "legacy":
            sm.__dict__["_COARSE_MULTI"] = False
        else:
            sm.__dict__["_COARSE_MULTI"] = True
            for kv in parts[1:]:
                kk, vv = kv.split("=")
                if kk == "k":
                    sm.__dict__["_COARSE_K"] = int(vv)
                elif kk == "tile":
                    sm.__dict__["_multi_tile"] = lambda hc, _t=int(vv): _t
                elif kk == "hwin":
                    sm.__dict__["_COARSE_HWIN"] = (
                        None if vv == "0" else int(vv)
                    )

        def tail_loop(lp, n):
            def body(_, acc):
                r = sm.component_min_coarse_from_padded(
                    lp, p=p, h=size, w=size, col_off=col_off
                )
                # serialise iterations via a data dependency
                return acc + r[0, 0] + r[size // 2, size // 2]

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        f = jax.jit(partial(tail_loop, n=inner))
        t0 = time.perf_counter()
        chk = int(f(lab_pad))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            chk2 = int(f(lab_pad))
            best = min(best, (time.perf_counter() - t0) / inner)
        assert chk == chk2
        print(
            f"{cfg:>22}: tail {best * 1e3:7.2f} ms/iter "
            f"(compile {compile_s:.0f}s, chk={chk})",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Steady-state bench for BASELINE config 5: batched 64x1024^2 transforms.

Measures ``transform_batch``'s stacked-relax device path (the (B*H, W)
vertical stacking with per-image NEVER_FILL borders, seeds given as
pre-painted labels0 — models/base.py:276) with the bench.py methodology:
``inner`` serially-dependent batch transforms inside ONE jitted
lax.fori_loop, forced by a scalar fetch, exact int32 checksum asserted
across every iteration and rep.  Run on the TPU:
``python tools/bench_batched.py [B [size]]``; ``BENCH_MERGING=1`` benches
the MERGING variant (per-image separator rows segment the component-min
scans, exactly like transform_batch's merging stacking).

The merging bench passes ``batch=``/``batch_mins=`` exactly as the public
``transform_batch`` does (models/base.py ~:436), so the per-image broadcast
shortcut is on the measured path; ``BENCH_GENERAL=1`` measures the general
scan-tail path instead (what non-full-interior inputs pay).  A one-shot
label cross-check of the two programs runs after the timing
(``BENCH_VERIFY=0`` skips) — the recorded number doubles as a hardware
parity certificate when it prints OK.
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

    from rustronomy_watershed_tpu.constants import NEVER_FILL
    from rustronomy_watershed_tpu.models.base import _label_bucket
    from rustronomy_watershed_tpu.ops.level_driver import run_levels_impl

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    merging = os.environ.get("BENCH_MERGING", "0") == "1"
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 254, size=(b, size, size)).astype(np.uint8)
    imgs[:, 0, :] = NEVER_FILL
    imgs[:, -1, :] = NEVER_FILL
    imgs[:, :, 0] = NEVER_FILL
    imgs[:, :, -1] = NEVER_FILL
    if merging:
        # One NEVER_FILL separator row per image (transform_batch's merging
        # stacking): a permanent label-0 barrier for the component-min scans.
        sep = np.full((b, size + 1, size), NEVER_FILL, dtype=np.uint8)
        sep[:, :size] = imgs
        imgs = sep
    stacked = imgs.reshape(-1, size)

    # Seeds as transform_batch receives them: pre-painted labels0 (host
    # NumPy strict-local-maxima + row-major numbering, quirk Q1).
    hh, ww = stacked.shape
    ok = np.ones((hh - 2, ww - 2), dtype=bool)
    centre = stacked[1:-1, 1:-1]
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            ok &= stacked[1 + dy : hh - 1 + dy, 1 + dx : ww - 1 + dx] < centre
    mask = np.zeros((hh, ww), dtype=bool)
    mask[1:-1, 1:-1] = ok
    labels0 = (np.cumsum(mask.ravel()).reshape(hh, ww) * mask).astype(np.int32)
    n_seeds = int(labels0.max())
    bucket = _label_bucket(n_seeds)

    # Mirror transform_batch's merging fast path: per-image broadcast
    # shortcut via batch=/batch_mins= (sound here by construction — the
    # per-image NEVER_FILL borders can never be strict local maxima, so no
    # border seeds exist; assert it anyway).  h_img is the per-image height
    # per level_driver's (b, hs, h_img) contract (= size only because this
    # bench generates square images).
    h_img = size
    hs = h_img + 1 if merging else h_img
    batch_kw = {}
    if merging and os.environ.get("BENCH_GENERAL", "0") != "1":
        lab3 = labels0.reshape(b, hs, size)
        border = np.zeros((hs, size), dtype=bool)
        border[0, :] = border[h_img - 1, :] = True
        border[:, 0] = border[:, -1] = True
        border[h_img:, :] = True  # separator row(s)
        assert not (lab3[:, border] > 0).any(), "border seed in bench field"
        mins = np.where(
            lab3.reshape(b, -1).max(axis=1) > 0,
            np.where(lab3 > 0, lab3, np.iinfo(np.int32).max)
            .reshape(b, -1)
            .min(axis=1),
            0,
        ).astype(np.int32)
        # The broadcast shortcut is a runtime lax.cond gate
        # (ops/level_driver.py `fast`): assert on the host that it MUST
        # fire for this field, or the '(broadcast path)' label below would
        # silently mislabel a general-tail timing.  Sufficient conditions,
        # checked on the input: (a) every per-image interior value is
        # claimable (< NEVER_FILL) — the interior is one 4-connected
        # rectangle, so at full depth every interior cell of a seeded image
        # gets claimed; (b) every image has a seed (mins > 0); (c) no
        # border seeds (asserted above) — borders stay unclaimed.  Together
        # these pin n_uncl == structural count and any_cl_border == False.
        imgs3 = imgs.reshape(b, hs, size)
        assert (imgs3[:, 1 : h_img - 1, 1:-1] < NEVER_FILL).all(), (
            "unclaimable interior pixel: broadcast gate would not fire"
        )
        assert (mins > 0).all(), (
            "seedless image: broadcast gate would not fire"
        )
        batch_kw = dict(batch=(b, hs, h_img), batch_mins=jnp.asarray(mins))

    img_d = jax.device_put(jnp.asarray(stacked))
    lab_d = jax.device_put(jnp.asarray(labels0))
    jax.block_until_ready((img_d, lab_d))

    def checksum(lab):
        lab = lab.reshape(-1).astype(jnp.int32)
        pos = jax.lax.iota(jnp.int32, lab.shape[0]) * jnp.int32(-1640531527)
        return jnp.sum(lab) ^ jnp.sum(lab * pos)

    npx = b * size * size
    inner = int(max(16, min(1024, round(2600.0 / (npx / 1.3e6)))))

    @partial(jax.jit, static_argnames=("n",))
    def run_many(img, lab0, n):
        def body(i, carry):
            chk_prev, acc = carry
            salt = jnp.where(chk_prev == jnp.int32(-123456789), 1, 0).astype(
                jnp.uint8
            )
            out = run_levels_impl(
                img + salt,
                lab0,
                n_labels=bucket,
                max_water_level=254,
                merging=merging,
                collect="none",
                backend="relax_pallas",
                **batch_kw,
            )
            chk = checksum(out)
            return chk, acc.at[i].set(chk)

        _, acc = jax.lax.fori_loop(
            0, n, body, (jnp.int32(0), jnp.zeros((n,), jnp.int32))
        )
        return acc

    acc = np.asarray(run_many(img_d, lab_d, inner))
    assert np.all(acc == acc[0]), f"nondeterministic: {acc}"
    chk0 = acc[0]
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = np.asarray(run_many(img_d, lab_d, inner))
        times.append(time.perf_counter() - t0)
        assert np.all(acc == chk0)

    dt = min(times) / inner
    variant = "merging" if merging else "segmenting"
    if merging:
        variant += " (broadcast path)" if batch_kw else " (general tail)"
    print(
        f"batched {b}x{size}^2 {variant}: {npx / dt / 1e6:.0f} Mpix/s "
        f"({dt * 1e3:.1f} ms per batch, inner={inner}, seeds={n_seeds})"
    )

    if batch_kw and os.environ.get("BENCH_VERIFY", "1") == "1":
        # One-shot parity certificate, AFTER the timing so a degraded
        # remote-compile window can't eat the measurement: the
        # broadcast-shortcut program must produce bit-identical labels to
        # the general scan-tail program on this exact field, on hardware.
        fast = jax.jit(
            lambda im, la: run_levels_impl(
                im, la, n_labels=bucket, max_water_level=254, merging=True,
                collect="none", backend="relax_pallas", **batch_kw,
            )
        )(img_d, lab_d)
        gen = jax.jit(
            lambda im, la: run_levels_impl(
                im, la, n_labels=bucket, max_water_level=254, merging=True,
                collect="none", backend="relax_pallas",
            )
        )(img_d, lab_d)
        if not bool(jnp.all(fast == gen)):
            raise AssertionError("broadcast shortcut != general scan tail")
        print("verify: shortcut == general tail OK", file=sys.stderr)


if __name__ == "__main__":
    main()

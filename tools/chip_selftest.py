"""On-chip parity battery: run the TPU engines on REAL hardware against
host-side oracles that never touch XLA.

Motivation (round 3): a TPU-only numerical hazard (DEFAULT matmul precision
truncating f32 inputs to bf16) silently corrupted seed numbering at >= 2048²
while every CPU test stayed green — CPU CI cannot certify what the chip
computes.  This script is the hardware counterpart of tests/: it compares

  1. jnp seed numbering (`seed_labels_from_mask`) vs host NumPy cumsum,
  2. the fused pack kernel (mask + numbering + packed planes) vs host NumPy,
  3. relax_pallas end-to-end labels vs the C++ oracle (parity/oracle.cc —
     exact reference semantics, no JAX/XLA involved) at full 254 levels,
     both variants (segmenting + merging), plus a NaN-masked merging field
     (the GENERAL component-min scan tail — dense fields take the
     single-component broadcast shortcut instead, so without this row the
     branch real astronomy data runs would go uncertified), plus the
     striped (column-blocked) engine on a forced 2-stripe grid — both
     variants again (merging exercises the broadcast shortcut on-chip),
  4. relax_pallas lake-size curves vs the C++ oracle's, and the public
     transform_to_list of BOTH variants (merging = compact planes + edge
     Kruskal; segmenting = compact planes + cumulative counts),

on the ambient (TPU) platform.  Exit code 0 == all checks passed.

Usage: ``python tools/chip_selftest.py [--size 2048] [--oracle-size 1024]``
(the oracle comparison is CPU-bound host work; 1024² keeps it ~a minute).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check(name, cond, detail="", log=print):
    status = "ok " if cond else "FAIL"
    log(f"[{status}] {name}{(' — ' + detail) if detail else ''}")
    return bool(cond)


def numbering_and_pack_checks(rng, size, log=print):
    """Checks 1+2: jnp seed numbering and the fused pack kernel vs host NumPy
    at ``size``² on the ambient platform.  This is the subset bench.py runs
    before every timing pass (the bf16-truncation hazard class: integer
    numbering corrupted on chip while CPU CI stayed green).

    Packaged as ONE jitted probe (remote compiles cost 30-90 s each on the
    tunnelled dev platform) at the production geometry (tuned steps/tile);
    the pack comparison reduces to scalar diff counts on device so only the
    numbering plane rides the slow downlink for the host-NumPy check.
    """
    from functools import partial

    import jax
    import jax.numpy as jnp

    from rustronomy_watershed_tpu.ops.pallas_pack import pack_domain_fused
    from rustronomy_watershed_tpu.ops.pallas_relax import auto_tile, pack_domain
    from rustronomy_watershed_tpu.ops.seeds import (
        local_extrema_mask,
        seed_labels_from_mask,
    )
    from rustronomy_watershed_tpu.ops.tune import relax_steps, relax_tile

    steps = relax_steps(size)
    tile = relax_tile(size, steps) or auto_tile(size, steps)

    @partial(jax.jit, static_argnames=("tile", "steps"))
    def probe(img, *, tile, steps):
        mask = local_extrema_mask(img)
        num = seed_labels_from_mask(mask)
        v0, k0, l0 = pack_domain(img, num, tile, steps)
        v1, k1, l1, n = pack_domain_fused(img, tile, steps)
        diffs = (
            jnp.sum((v0 != v1).astype(jnp.int32))
            + jnp.sum((k0 != k1).astype(jnp.int32))
            + jnp.sum((l0 != l1).astype(jnp.int32))
        )
        return num, diffs, n

    ok = True
    img_np = rng.integers(0, 255, size=(size, size)).astype(np.uint8)
    img = jax.device_put(jnp.asarray(img_np))
    num, diffs, n = probe(img, tile=tile, steps=steps)
    got = np.asarray(num)
    mask = got > 0
    truth = np.where(
        mask, np.cumsum(mask.astype(np.int64)).reshape(mask.shape), 0
    ).astype(np.int32)
    # The seed MASK itself is checked against a pure-NumPy rederivation (a
    # corrupted device mask would otherwise also corrupt `truth`).
    interior = img_np[1:-1, 1:-1]
    neigh = [
        img_np[1 + dy : img_np.shape[0] - 1 + dy, 1 + dx : img_np.shape[1] - 1 + dx]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
        if (dy, dx) != (0, 0)
    ]
    host_mask = np.zeros_like(img_np, dtype=bool)
    host_mask[1:-1, 1:-1] = np.logical_and.reduce([n < interior for n in neigh])
    ok &= check(
        f"extrema mask vs host NumPy @ {size}²",
        (host_mask == mask).all(),
        f"{(host_mask != mask).sum()} diffs",
        log=log,
    )
    ok &= check(
        f"jnp seed numbering vs host NumPy @ {size}²",
        (got == truth).all(),
        f"{(got != truth).sum()} diffs",
        log=log,
    )
    ok &= check(
        f"fused pack kernel vs jnp pack @ {size}² (device-compared)",
        int(diffs) == 0 and int(n) == truth.max(),
        f"{int(diffs)} plane diffs, seeds={int(n)}",
        log=log,
    )
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--oracle-size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--fuzz",
        type=int,
        default=12,
        help="content-fuzz trials vs the C++ oracle (fixed static shapes, "
        "so no recompiles — varies field content, dynamic range, "
        "sentinel density, variant)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from rustronomy_watershed_tpu.ops.pipeline import watershed_e2e_impl
    from rustronomy_watershed_tpu.parity.native import (
        native_find_local_minima,
        native_transform,
    )

    print(f"platform: {jax.devices()[0].platform} ({jax.devices()[0]})")
    rng = np.random.default_rng(args.seed)
    ok = True

    # --- 1+2: numbering and fused pack vs host NumPy at --size ---
    ok &= numbering_and_pack_checks(rng, args.size)

    # --- 3+4: e2e vs the C++ oracle (no XLA) at --oracle-size, 254 levels ---
    osz = args.oracle_size
    img_np = rng.integers(0, 254, size=(osz, osz)).astype(np.uint8)
    img = jax.device_put(jnp.asarray(img_np))
    seeds = native_find_local_minima(img_np)
    want_by_variant = {}
    for merging in (False, True):
        t0 = time.time()
        want = native_transform(img_np, seeds, 254, merging=merging)
        want_by_variant[merging] = want
        t_or = time.time() - t0
        got = np.asarray(
            jax.jit(
                partial(
                    watershed_e2e_impl,
                    max_water_level=254,
                    merging=merging,
                    backend="relax_pallas",
                )
            )(img)
        )
        name = "merging" if merging else "segmenting"
        ok &= check(
            f"relax_pallas {name} vs C++ oracle @ {osz}²/254 lvls",
            (got == want).all(),
            f"{(got != want).sum()} diffs, oracle {t_or:.1f}s",
        )

    # General (NaN-masked) merging tail at scale: the dense checks above
    # satisfy the single-component broadcast shortcut; real astronomy
    # fields are NaN-heavy (reference integration.rs:343-428) and their
    # NEVER_FILL lacing leaves unclaimed interior pixels, so the merging
    # lax.cond takes the component-min SCAN branch — this check certifies
    # that branch on hardware at scale (same compiled program as check 4:
    # the branch select is runtime data).
    gimg_np = img_np.copy()
    gimg_np[rng.random((osz, osz)) < 0.10] = 255
    gseeds = native_find_local_minima(gimg_np)
    want_g = native_transform(gimg_np, gseeds, 254, merging=True)
    got_g = np.asarray(
        jax.jit(
            partial(
                watershed_e2e_impl,
                max_water_level=254,
                merging=True,
                backend="relax_pallas",
            )
        )(jnp.asarray(gimg_np))
    )
    ok &= check(
        f"NaN-masked merging (general scan tail) vs C++ oracle @ {osz}²",
        (got_g == want_g).all(),
        f"{(got_g != want_g).sum()} diffs",
    )

    # Striped (column-blocked) engine on REAL hardware vs the same oracle
    # outputs.  The resolver only engages stripes at >= ~6k lanes by itself;
    # a forced 2-stripe grid compiles + runs the 2-D Mosaic kernel (and, for
    # merging on this dense field, the single-component broadcast shortcut)
    # at probe scale.  interpret-mode CPU parity cannot certify this kernel
    # on the chip (see the module docstring's bf16 lesson).
    os.environ["RWT_RELAX_STRIPES"] = f"2,{(osz // 2 + 127) // 128 * 128}"
    try:
        for merging in (False, True):
            got = np.asarray(
                jax.jit(
                    partial(
                        watershed_e2e_impl,
                        max_water_level=254,
                        merging=merging,
                        backend="relax_pallas",
                    )
                )(img)
            )
            name = "merging" if merging else "segmenting"
            ok &= check(
                f"striped relax_pallas {name} vs C++ oracle @ {osz}²",
                (got == want_by_variant[merging]).all(),
                f"{(got != want_by_variant[merging]).sum()} diffs",
            )
    finally:
        del os.environ["RWT_RELAX_STRIPES"]

    # merging transform_to_list through the public API (the merge_curve
    # fast path: device edge extraction + host Kruskal) vs the oracle's
    # per-level merged histograms.
    from rustronomy_watershed_tpu import TransformBuilder

    msz = 512
    mimg = rng.integers(0, 254, size=(msz, msz)).astype(np.uint8)
    ws = TransformBuilder.default().build_merging()
    mseeds = ws.find_local_minima(mimg)
    _, want_msz = native_transform(
        mimg, mseeds, 254, merging=True, with_sizes=True
    )
    curve = ws.transform_to_list(mimg, mseeds, counts_length=len(mseeds) + 1)
    got_msz = np.stack([np.asarray(c[1]) for c in curve])
    ok &= check(
        f"merging transform_to_list (merge_curve) vs C++ oracle @ {msz}²",
        (got_msz == want_msz).all(),
        f"{(got_msz != want_msz).sum()} diffs",
    )

    # segmenting transform_to_list through the public API (the compact-
    # planes path: one relax pass + host cumulative counts, zero edges)
    # vs the oracle's per-level histograms.
    ws_seg = TransformBuilder.default().build_segmenting()
    _, want_ssz = native_transform(
        mimg, mseeds, 254, merging=False, with_sizes=True
    )
    curve_s = ws_seg.transform_to_list(mimg, mseeds, counts_length=len(mseeds) + 1)
    got_ssz = np.stack([np.asarray(c[1]) for c in curve_s])
    ok &= check(
        f"segmenting transform_to_list (compact planes) vs C++ oracle @ {msz}²",
        (got_ssz == want_ssz).all(),
        f"{(got_ssz != want_ssz).sum()} diffs",
    )

    # sizes curve (segmenting collect='sizes' vs oracle with_sizes)
    _, want_sz = native_transform(img_np, seeds, 254, merging=False, with_sizes=True)
    _, got_sz = jax.jit(
        partial(
            watershed_e2e_impl,
            max_water_level=254,
            merging=False,
            backend="relax_pallas",
            collect="sizes",
            n_labels=len(seeds),
        )
    )(img)
    got_sz = np.asarray(got_sz)
    ok &= check(
        f"relax_pallas lake-size curves vs C++ oracle @ {osz}²",
        (got_sz == want_sz).all(),
        f"{(got_sz != want_sz).sum()} diffs",
    )

    # Mesh path on REAL hardware: a 1x1 mesh compiles the shard_map +
    # Mosaic-kernel path with interpret=False (CPU CI only ever runs it in
    # interpret mode) — degenerate collectives, real kernel.
    from jax.sharding import Mesh

    from rustronomy_watershed_tpu.ops import paint_seeds, run_levels
    from rustronomy_watershed_tpu.parallel import tiled_transform

    tsz = 512
    timg = rng.integers(0, 40, size=(tsz, tsz)).astype(np.uint8)
    tseeds = [(5, 5), (100, 400), (300, 128), (450, 450)]
    tlab0 = paint_seeds((tsz, tsz), tseeds)
    want_t = np.asarray(
        run_levels(jnp.asarray(timg), tlab0, n_labels=4, max_water_level=39,
                   merging=True)
    )
    mesh11 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("y", "x"))
    got_t = np.asarray(
        tiled_transform(timg, tlab0, mesh11, n_labels=4, max_water_level=39,
                        merging=True, halo=16, backend="relax_pallas")
    )
    ok &= check(
        f"tiled relax_pallas (shard_map, real Mosaic kernel) @ {tsz}² 1x1 mesh",
        (got_t == want_t).all(),
        f"{(got_t != want_t).sum()} diffs",
    )

    # Mesh merging transform_to_list (collect='claims' + host Kruskal) on
    # real hardware vs the single-device entry point.
    ws_m = TransformBuilder.default().set_max_water_lvl(39).build_merging()
    ws_mm = (
        TransformBuilder.default().set_max_water_lvl(39).set_mesh(mesh11)
        .build_merging()
    )
    tseeds2 = ws_m.find_local_minima(timg)
    want_c = ws_m.transform_to_list(timg, tseeds2, counts_length=len(tseeds2) + 1)
    got_c = ws_mm.transform_to_list(timg, tseeds2, counts_length=len(tseeds2) + 1)
    ok &= check(
        f"mesh merging transform_to_list @ {tsz}² 1x1 mesh",
        all((a[1] == b[1]).all() and a[0] == b[0] for a, b in zip(want_c, got_c)),
        "",
    )

    # Edge-corrected transform on a preprocessed NaN-laced float field
    # (quirk Q4 + Q7 end-to-end through the public API) vs the oracle.
    esz = 256
    field = rng.normal(size=(esz, esz)).astype(np.float64)
    field[rng.random((esz, esz)) < 0.05] = np.nan
    field[rng.random((esz, esz)) < 0.02] = np.inf
    wse = TransformBuilder.default().enable_edge_correction().build_segmenting()
    u8 = np.asarray(wse.pre_processor(field))
    eseeds = wse.find_local_minima(u8)
    got_e = np.asarray(wse.transform(u8, eseeds))
    want_e = native_transform(u8, eseeds, 254, merging=False, edge_correction=True)
    ok &= check(
        f"edge-corrected segmenting on NaN-preprocessed field @ {esz}²",
        (got_e == want_e).all(),
        f"{(got_e != want_e).sum()} diffs",
    )

    # Non-square geometry: H != W exercises the lane-padding (wp) and band
    # (h2) rounding paths with different row/column extents — a miscompile
    # class the square trials cannot separate from content effects.
    for nsq_shape in ((320, 512), (512, 320)):
        nimg = rng.integers(0, 255, size=nsq_shape).astype(np.uint8)
        nseeds = native_find_local_minima(nimg)
        for merging in (False, True):
            want_n = native_transform(nimg, nseeds, 254, merging=merging)
            got_n = np.asarray(
                jax.jit(
                    partial(
                        watershed_e2e_impl,
                        max_water_level=254,
                        merging=merging,
                        backend="relax_pallas",
                    )
                )(jnp.asarray(nimg))
            )
            ok &= check(
                f"non-square {'merging' if merging else 'segmenting'} @ "
                f"{nsq_shape[0]}x{nsq_shape[1]}",
                (got_n == want_n).all(),
                f"{(got_n != want_n).sum()} diffs",
            )

    # Real-morphology golden (battery check 20, VERDICT r4 #5): the
    # committed smoothed+blob-NaN 1024² fixture (the reference's
    # smoothed-CGPS integration case, integration.rs:517-602, pinned
    # without network/astropy by tools/gen_golden_morph.py).  Plateaus
    # thousands of pixels deep + 11% NEVER_FILL coverage blobs — certifies
    # ring-order (Q3) and the blob-morphology general tail ON HARDWARE
    # against frozen labels (no oracle run needed here).
    morph_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "golden_morph_v1.npz",
    )
    morph = np.load(morph_path)
    # watershed_e2e_impl derives seeds from the image with the same Q1
    # strict-local-max rule the fixture was generated under — the committed
    # seed list is implied by the committed image.
    for merging in (False, True):
        variant = "merging" if merging else "segmenting"
        got_m = np.asarray(
            jax.jit(
                partial(
                    watershed_e2e_impl,
                    max_water_level=254,
                    merging=merging,
                    backend="relax_pallas",
                    n_labels=int(morph["seeds"].shape[0]),
                )
            )(jnp.asarray(morph["img"]))
        )
        want_m = morph[f"{variant}/labels"]
        ok &= check(
            f"smoothed+blob-NaN morphology golden ({variant}) @ 1024²",
            (got_m == want_m).all(),
            f"{(got_m != want_m).sum()} diffs",
        )

    # Content fuzz: many random fields through ONE compiled program per
    # variant (fixed shape + statics) vs the oracle — hunts data-dependent
    # platform miscompiles of the kind CPU CI cannot see.
    fsz = 384
    fns = {
        m: jax.jit(
            partial(
                watershed_e2e_impl,
                max_water_level=254,
                merging=m,
                backend="relax_pallas",
            )
        )
        for m in (False, True)
    }
    bad = 0
    for t in range(args.fuzz):
        hi = int(rng.choice([3, 8, 32, 128, 254]))
        fimg = rng.integers(0, hi, size=(fsz, fsz)).astype(np.uint8)
        for frac, val in ((rng.random() * 0.05, 0), (rng.random() * 0.05, 255)):
            fimg[rng.random((fsz, fsz)) < frac] = val
        merging = bool(t % 2)
        fseeds = native_find_local_minima(fimg)
        want_f = native_transform(fimg, fseeds, 254, merging=merging)
        got_f = np.asarray(fns[merging](jnp.asarray(fimg)))
        if not (got_f == want_f).all():
            bad += 1
            print(
                f"  fuzz trial {t}: hi={hi} merging={merging} "
                f"{(got_f != want_f).sum()} diffs"
            )
    ok &= check(
        f"content fuzz vs C++ oracle @ {fsz}² ({args.fuzz} trials)",
        bad == 0,
        f"{bad} failing trials",
    )

    print("ALL OK" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

"""Phase attribution for the merging transform_to_list tail (VERDICT #5).

Times, separately and warm: the device program (forced by a scalar fetch),
the compact-plane downloads (the ~12 MB/s tunnel is the suspected wall),
and the native C++ union/redistribution tail.  Run on the TPU:

  python tools/probe_to_list.py [size [reps]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rustronomy_watershed_tpu.ops.merge_curve import (
        _device_curves,
        merged_curve_host,
        unpack_wire,
    )
    from rustronomy_watershed_tpu.ops.seeds import (
        local_extrema_mask,
        seed_labels_from_mask,
    )
    from rustronomy_watershed_tpu.models.base import _label_bucket

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.default_rng(0)
    img_np = rng.integers(0, 254, size=(size, size)).astype(np.uint8)
    img = jax.device_put(jnp.asarray(img_np))
    lab0 = seed_labels_from_mask(local_extrema_mask(img.astype(jnp.int32)))
    k = int(jnp.max(lab0))
    bucket = _label_bucket(k)
    print(f"{size}^2, {k} seeds, bucket {bucket}", flush=True)

    def run():
        t0 = time.perf_counter()
        final, labels, lv8, lo, hi, act, n, starved = _device_curves(
            img, lab0, n_labels=bucket, max_water_level=254,
            backend="relax_pallas", tile=None, steps=None, interpret=False,
            with_final=False,
        )
        n_host = int(n)  # scalar fetch = device sync point
        t1 = time.perf_counter()
        edges = (lo[:n_host], hi[:n_host], act[:n_host].astype(jnp.uint8))
        if labels.dtype == jnp.uint32:  # packed wire tier
            wire_np, lo_np, hi_np, act_np = jax.device_get((labels,) + edges)
            labels_np, lv8_np = unpack_wire(wire_np)
        else:
            labels_np, lv8_np, lo_np, hi_np, act_np = jax.device_get(
                (labels, lv8) + edges
            )
        t2 = time.perf_counter()
        sizes = merged_curve_host(labels_np, lv8_np, bucket, 254, lo_np,
                                  hi_np, act_np)
        t3 = time.perf_counter()
        return (t1 - t0, t2 - t1, t3 - t2), n_host, sizes

    (d, dl, host), n, sizes0 = run()  # warm/compile
    print(f"warm: device+sync {d:.3f}s  download {dl:.3f}s  host {host:.3f}s"
          f"  edges={n}", flush=True)
    for r in range(reps):
        (d, dl, host), _, sizes = run()
        assert (sizes == sizes0).all()
        tot = d + dl + host
        print(f"rep{r}: device+sync {d:.3f}s  download {dl:.3f}s  "
              f"host {host:.3f}s  total {tot:.3f}s", flush=True)


if __name__ == "__main__":
    main()

"""Generate committed golden fixtures (tests/golden/) from the event-driven
heap oracle (parity/heap_oracle.py) — the repo's third, algorithmically
independent implementation of the reference semantics.

Provenance note: true golden outputs from the Rust crate itself cannot be
generated in this environment (no Rust toolchain is installed and there is no
network egress to fetch one — see tests/golden/README.md).  The committed
fixtures are the VERDICT-sanctioned fallback: outputs of an independent
algorithm family (Dijkstra-style event claiming, no shared code with the
sweep engines), pinned at generation time so any later drift in ANY engine is
caught.

Run: python tools/gen_golden.py   (rewrites tests/golden/golden_v1.npz)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustronomy_watershed_tpu.models.base import WatershedUtils
from rustronomy_watershed_tpu.parity.heap_oracle import (
    heap_find_local_minima,
    heap_transform,
)
from rustronomy_watershed_tpu.utils import fields

SIZE = (64, 64)


def field_matrix():
    """SURVEY.md §4's integration matrix, synthetic equivalents at 64²."""
    util = WatershedUtils()
    uniform = fields.uniform_field(SIZE, hi=254, seed=101)
    poisson = util.pre_processor(fields.poisson_field(SIZE, lam=30.0, seed=102))
    grf = util.pre_processor(fields.gaussian_random_field(SIZE, power=-2.5, seed=103))
    nanmasked = util.pre_processor(
        fields.nan_masked_field(
            fields.gaussian_random_field(SIZE, power=-3.0, seed=104),
            frac=0.25,
            seed=104,
        )
    )
    return {"uniform": uniform, "poisson": poisson, "grf": grf, "nanmasked": nanmasked}


def main():
    out = {}
    for name, img in field_matrix().items():
        seeds = heap_find_local_minima(img)
        out[f"{name}/img"] = img
        out[f"{name}/seeds"] = np.asarray(seeds, dtype=np.int64).reshape(-1, 2)
        for merging in (False, True):
            variant = "merging" if merging else "segmenting"
            labels, sizes = heap_transform(
                img, seeds, 254, merging=merging, with_sizes=True
            )
            out[f"{name}/{variant}/labels"] = labels.astype(np.int32)
            out[f"{name}/{variant}/sizes"] = sizes.astype(np.int64)
        print(f"{name}: {len(seeds)} seeds")
    # one edge-correction case (padded-shape output, Q7)
    img = out["uniform/img"]
    seeds = [(0, 5), (20, 30), (63, 40)]  # incl. border seeds
    labels = heap_transform(img, seeds, 254, merging=True, edge_correction=True)
    out["edge/seeds"] = np.asarray(seeds, dtype=np.int64)
    out["edge/merging/labels"] = labels.astype(np.int32)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "golden",
        "golden_v1.npz",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print("wrote", path, f"({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()

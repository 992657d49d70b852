"""Input pre-processing: normalise any numeric array to u8 water levels.

Replicates the reference ``WatershedUtils::pre_processor_with_max`` **code**
behaviour (/root/reference/src/lib.rs:1134-1173), which differs from its own
docs (SURVEY.md Q4):

* ``is_normal`` values  -> ``trunc((x - min) / (max - min) * MAX)`` as u8
* ``+inf``              -> ``ALWAYS_FILL`` (0)
* ``NaN``, ``-inf``, exactly ``0.0`` and subnormals -> ``NEVER_FILL`` (255)
  (``f64::is_normal`` excludes zero and subnormals, so integer zeros also map
  to NEVER_FILL)
* ``min``/``max`` are folds seeded with 0 over *finite* values
  (src/lib.rs:1147-1156), so the normalisation range always contains 0.

The host entry point uses numpy float64 for bit-faithful ``is_normal``
semantics; ``pre_process_jnp`` is the jittable float32 device variant for
in-pipeline use (subnormal cutoff differs at f32 precision — documented
divergence, irrelevant for normal-range astronomy data).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import ALWAYS_FILL, NEVER_FILL, NORMAL_MAX

_F64_MIN_NORMAL = np.finfo(np.float64).tiny


def pre_process(img, max_val: int = NORMAL_MAX) -> np.ndarray:
    """Host (numpy, f64) pre-processor; any numeric dtype, any rank."""
    if not (ALWAYS_FILL < max_val < NEVER_FILL):
        raise ValueError(
            f"max_val must satisfy {ALWAYS_FILL} < max_val < {NEVER_FILL}, got {max_val}"
        )
    x = np.asarray(img, dtype=np.float64)
    finite = np.isfinite(x)
    fin = np.where(finite, x, 0.0)
    # Folds seeded with zero over finite values (src/lib.rs:1147-1156).
    mn = min(0.0, float(fin.min())) if fin.size else 0.0
    mx = max(0.0, float(fin.max())) if fin.size else 0.0

    is_normal = finite & (np.abs(x) >= _F64_MIN_NORMAL)
    pos_inf = np.isinf(x) & (x > 0)

    with np.errstate(invalid="ignore", divide="ignore"):
        normal = (fin - mn) / (mx - mn) if mx != mn else np.zeros_like(fin)
    scaled = np.trunc(normal * float(max_val)).astype(np.uint8)

    out = np.full(x.shape, NEVER_FILL, dtype=np.uint8)
    out[is_normal] = scaled[is_normal]
    out[pos_inf] = ALWAYS_FILL
    return out


def pre_process_jnp(img: jnp.ndarray, max_val: int = NORMAL_MAX) -> jnp.ndarray:
    """Jittable device variant (float32 internals)."""
    x = jnp.asarray(img, dtype=jnp.float32)
    finite = jnp.isfinite(x)
    fin = jnp.where(finite, x, 0.0)
    mn = jnp.minimum(0.0, jnp.min(fin))
    mx = jnp.maximum(0.0, jnp.max(fin))

    tiny = jnp.float32(np.finfo(np.float32).tiny)
    is_normal = finite & (jnp.abs(x) >= tiny)
    pos_inf = jnp.isinf(x) & (x > 0)

    denom = jnp.where(mx != mn, mx - mn, 1.0)
    scaled = jnp.trunc((fin - mn) / denom * float(max_val)).astype(jnp.uint8)

    out = jnp.full(x.shape, NEVER_FILL, dtype=jnp.uint8)
    out = jnp.where(is_normal, scaled, out)
    return jnp.where(pos_inf, jnp.uint8(ALWAYS_FILL), out)

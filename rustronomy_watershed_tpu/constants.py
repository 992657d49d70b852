"""Label / pixel-value conventions of the watershed transforms.

Mirrors the public constants of the reference crate
(/root/reference/src/lib.rs:138-141):

* ``UNCOLOURED``  — label value of pixels not (yet) claimed by any lake.
* ``NORMAL_MAX``  — highest legal water level (254).
* ``ALWAYS_FILL`` — pixel value (0) that floods at water level 0.
* ``NEVER_FILL``  — pixel value (255) that never floods (255 <= lvl is never
  true because lvl <= 254).
"""

UNCOLOURED: int = 0
NORMAL_MAX: int = 254
ALWAYS_FILL: int = 0
NEVER_FILL: int = 255

# Sentinel used internally by the device kernels for "no neighbour label".
# Any value strictly larger than the largest possible label works.
INT32_MAX: int = 2**31 - 1

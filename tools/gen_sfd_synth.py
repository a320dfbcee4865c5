"""Generate the packaged SYNTHETIC SFD hemisphere rasters.

Writes ``fink_filters_spark/data/sfd_synth_{ngp,sgp}.fits.gz``: 256x256
float32 Lambert polar azimuthal equal-area maps (the exact SFD98 Appendix C
pixel geometry ``operators/cosmology.sfd_pixel`` implements) filled with an
ANALYTIC dust law so tests can compute expected E(B-V) independently of the
raster (the single source of truth is ``cosmology.synth_ebv_law``):

    E(B-V)(l, b) = 0.02 * (2 + sin b)
                 + 0.30 * exp(-|b| / 10 deg) * (1 + 0.5 cos l + 0.3 sin l)

— a cosecant-like galactic-plane concentration with longitudinal modulation;
the sin terms deliberately break the b -> -b and l -> -l symmetries so a
hemisphere swap or mirrored transform is detectable. The real
``SFD_dust_4096_{ngp,sgp}.fits`` files drop in by passing their paths to
``load_sfd_maps`` — same codec, same geometry, only ``size`` grows.

Run: python tools/gen_sfd_synth.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fink_filters_spark.operators.cosmology import synth_ebv_law  # noqa: E402
from fink_filters_spark.operators.fits import write_fits  # noqa: E402

SIZE = 256


def hemisphere(n_sign: float) -> np.ndarray:
    """Inverse Lambert transform per pixel -> (l, b) -> analytic law."""
    rr = SIZE / 2.0
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float64)
    u = (xx - (rr - 0.5)) / rr          # = root * cos(l)
    v = -(yy - (rr - 0.5)) / (rr * n_sign)  # = root * sin(l)
    rho2 = np.clip(u * u + v * v, 0.0, 2.0)
    sin_b = n_sign * (1.0 - rho2)
    b = np.arcsin(np.clip(sin_b, -1.0, 1.0))
    ell = np.arctan2(v, u)
    return synth_ebv_law(ell, b)


def main() -> None:
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fink_filters_spark", "data",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name, sign in (("ngp", 1.0), ("sgp", -1.0)):
        payload = write_fits(hemisphere(sign), compress=True)
        path = os.path.join(out_dir, f"sfd_synth_{name}.fits.gz")
        with open(path, "wb") as f:
            f.write(payload)
        print(path, len(payload), "bytes")


if __name__ == "__main__":
    main()

"""Published SFD98 E(B-V) golden sightlines — the drop-in verification gate
for real dust rasters.

The engine ships synthetic SFD hemisphere rasters (real geometry, analytic
values — ``cosmology.synth_ebv_law``) because the real
``SFD_dust_4096_{ngp,sgp}.fits`` maps (~500 MB) are not redistributable
here. The reference consumes the real maps through dustmaps
(``ztf/filter_early_tde_candidates/lcs.py:102-145``). This module pins a
handful of PUBLISHED Schlegel, Finkbeiner & Davis (1998) E(B-V) values at
named sightlines, so that the moment a user drops the real rasters in
(``load_sfd_maps(real_ngp, real_sgp)``), ``verify_sfd_rasters`` — and the
gated test in ``tests/test_programs.py`` — checks the whole chain
(FITS codec -> galactic conversion -> SFD98 Lambert pixel transform ->
nearest-pixel sample) against literature numbers WITHOUT any code change.

Provenance: every value below is a publicly published SFD-map E(B-V)
(magnitudes) quoted in the named paper or, for the galaxy sightlines, the
widely circulated SFD98 foreground value used across that object's
literature. Tolerances are deliberately loose enough to absorb the
difference between this module's nearest-pixel sample and dustmaps'
interpolated query (a few-percent effect at these smooth high-latitude
sightlines) and tight enough to catch a hemisphere swap, a transposed
raster, a mirrored transform, or a unit error — the failure modes a
drop-in actually risks.
"""

from __future__ import annotations

# (name, ra_deg, dec_deg, published E(B-V), absolute tolerance, source)
PUBLISHED_SIGHTLINES: list[tuple[str, float, float, float, float, str]] = [
    (
        "M31_core",
        10.6847,
        41.2690,
        0.062,
        0.012,
        "SFD98 foreground toward M31; the value quoted throughout the "
        "M31 Cepheid/novae literature (e.g. NED's Schlegel et al. 1998 "
        "E(B-V) for NGC 224)",
    ),
    (
        "M101_SN2011fe",
        210.8024,
        54.3488,
        0.009,
        0.006,
        "Milky Way reddening toward SN 2011fe / M101, E(B-V)_MW = 0.009 "
        "(Nugent et al. 2011, Nature 480, 344, from the SFD98 map)",
    ),
    (
        "HDF_North",
        189.2058,
        62.2161,
        0.012,
        0.008,
        "SFD98 E(B-V) toward the Hubble Deep Field North quoted in HDF "
        "photometry papers (~0.012 mag at l=125.9, b=54.8)",
    ),
    (
        "Coma_cluster",
        194.9531,
        27.9807,
        0.0085,
        0.006,
        "SFD98 foreground toward the Coma cluster (Abell 1656) center, "
        "E(B-V) ~ 0.0085-0.009 in Coma fundamental-plane literature",
    ),
    (
        "M51",
        202.4696,
        47.1952,
        0.035,
        0.012,
        "SFD98 foreground toward M51/NGC 5194, E(B-V) ~ 0.035 as quoted "
        "in its SN and stellar-population literature",
    ),
]


def verify_sfd_rasters(north, south) -> list[dict]:
    """Sample the given hemisphere rasters at every published sightline and
    report (name, expected, got, ok). Pure numpy — same transform chain as
    the Spark kernel (``cosmology.sfd_ebv`` calls the identical
    ``radec_to_lb`` + ``sfd_pixel`` + nearest-sample functions), so a pass
    here certifies the rasters for the distributed path too."""
    import numpy as np

    from .cosmology import radec_to_lb, sfd_pixel

    size = int(north.shape[0])
    out = []
    for name, ra, dec, expected, tol, source in PUBLISHED_SIGHTLINES:
        l, b = radec_to_lb(np.array([ra]), np.array([dec]))
        x, y, is_north = sfd_pixel(l, b, size)
        xi = int(np.clip(np.rint(x[0]), 0, size - 1))
        yi = int(np.clip(np.rint(y[0]), 0, size - 1))
        got = float((north if is_north[0] else south)[yi, xi])
        out.append(
            {
                "name": name,
                "expected": expected,
                "got": got,
                "tol": tol,
                "ok": abs(got - expected) <= tol,
                "source": source,
            }
        )
    return out

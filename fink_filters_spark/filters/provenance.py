"""Provenance pins for class lists vendored from fink-utils.

The reference imports two SIMBAD/VSX class lists at runtime from the
public ``fink-utils`` package (astrolabsoftware/fink-utils on PyPI /
GitHub), which is NOT importable in this offline container:

- ``fink_utils.xmatch.simbad.return_list_of_eg_host`` — the SIMBAD
  extragalactic-host otype allowlist (used by the SN-like ZTF filters,
  e.g. ``ztf/livestream/filter_sn_candidates/filter.py:94-98``, and by
  the Rubin galaxy block, ``rubin/blocks.py:126``).
- ``fink_utils.xmatch.vsx.return_list_of_nonstellar`` — the nonstellar
  side of the AAVSO-VSX type split (Rubin VSX veto,
  ``rubin/blocks.py:234,258``).

The engine therefore VENDORS transcriptions of those lists
(``ztf.EG_HOST_CLASSES``, ``rubin.VSX_NONSTELLAR_CLASSES``). A silent
upstream drift would diverge every consumer topic, so this module is the
single source of truth for what was transcribed and from where:

- ``PINNED_*`` below are frozen copies recorded at transcription time
  (fink-utils as of the reference fink-filters v7.35 dependency set,
  2026-08; fink-utils publishes no pin in the reference's
  requirements.txt, so the pin here is the transcription date).
- ``tests/test_provenance.py`` diffs the LIVE lists the filters actually
  use against these pinned copies — updating either side alone fails the
  suite, making an upstream refresh a conscious, reviewed two-place edit.
- When ``fink_utils`` IS importable (a connected deployment), the same
  test also diffs both against the real functions, closing the loop.

Lists transcribed directly from files under the reference tree itself
(GRAV_CLASSES, BLAZAR_CLASSES, YSO_CLASSES, RRLYR_CLASSES, BAD_VALUES)
need no pin here: the reference sources ship in-container and the parity
tests diff against them directly.
"""

from __future__ import annotations

# fink_utils.xmatch.simbad.return_list_of_eg_host (transcribed 2026-08,
# reference dependency set of fink-filters v7.35)
PINNED_EG_HOST_CLASSES = [
    "Unknown",
    "Transient",
    "Fail",
    "Candidate_SN*",
    "SN",
    "SN candidate",
    "Galaxy",
    "galaxy",
    "AGN",
    "AGN_Candidate",
    "QSO",
    "QSO_Candidate",
    "EmG",
    "Seyfert",
    "Seyfert_1",
    "Seyfert_2",
    "BlueCompG",
    "StarburstG",
    "LSB_G",
    "HII_G",
    "GinPair",
    "GinGroup",
    "GinCl",
    "BClG",
    "PartofG",
    "RadioG",
    "LINER",
]

# fink_utils.xmatch.vsx.return_list_of_nonstellar (transcribed 2026-08):
# the AAVSO VSX vocabulary's extragalactic variability classes; ":" is
# VSX's uncertain-classification suffix. return_list_of_stellar is the
# complement within the catalogued vocabulary (the reference's
# b_xmatched_vsx at rubin/blocks.py:238-259 is their concatenation).
PINNED_VSX_NONSTELLAR_CLASSES = ["AGN", "AGN:", "BLLAC", "BLLAC:", "QSO", "QSO:"]


def upstream_lists():
    """Fetch the real fink-utils lists when the package is importable.

    Returns ``{"eg_host": [...], "vsx_nonstellar": [...]}`` or ``None``
    offline. Import is attempted lazily so the offline container never
    pays or fails on it."""
    try:
        from fink_utils.xmatch.simbad import return_list_of_eg_host
        from fink_utils.xmatch.vsx import return_list_of_nonstellar
    except Exception:  # pragma: no cover - offline container
        return None
    return {
        "eg_host": list(return_list_of_eg_host()),
        "vsx_nonstellar": list(return_list_of_nonstellar()),
    }

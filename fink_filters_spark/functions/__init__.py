"""Native Column-expression library.

Everything in this package compiles to Catalyst expressions (no Python UDFs)
so it stays JVM-side inside whole-stage codegen — the Spark-first replacement
for the reference's pandas-UDF kernels.
"""

from .arrays import (  # noqa: F401
    hist_concat,
    last_el,
    linfit_r2,
    linfit_slope,
    pair_gap,
    rate_last2,
)
from .astro import (  # noqa: F401
    dc_mag,
    ecl_lat,
    flux2mag,
    gal_b,
    grid_cell,
    mag2fluxcal,
    neighbor_cells,
    register_sql_functions,
    sky_sep,
)
from .text import (  # noqa: F401
    char_fingerprint,
    punct_ratio,
    shingles,
    stopword_ratio,
    token_count,
    word_shingles,
)
from .vectors import cosine_sim_q, dot_q, norm_sq_q, quantize_vec  # noqa: F401

"""Pure numpy kernels — no Spark imports allowed in this subpackage.

Every kernel replicates the exact float64 operation order of the reference
(jillesvangurp/geogeometry) so results are bit-for-bit identical; each
function docstring cites the reference file:line it mirrors.
"""

"""DataFrame-level operators: the reference's imperative loops re-expressed
as Catalyst-optimizable plans (windows, aggs, interval joins) plus
pandas-UDF kernels where relational form genuinely can't express the
semantics."""

"""The sweep's independent-plan crosscheck variants must stay row-identical
to the primary queries — they are the verification path at scale factors
where the DuckDB oracle cannot materialize the (output-quadratic) interval
join results, so a drifted variant would silently weaken the sf1 sweep."""

import __spark_entry__ as E


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_crosscheck_names_are_primary_queries():
    primary = set(E.queries())
    for name in E.crosscheck_queries():
        assert name in primary


def test_crosscheck_variants_match_primary(spark, sf_small):
    qmap = E.queries()
    for name, alt in E.crosscheck_queries().items():
        a = _sorted_rows(qmap[name](spark, sf_small))
        b = _sorted_rows(alt(spark, sf_small))
        assert a == b, f"{name}: crosscheck variant diverged from primary"
        assert len(a) > 0, f"{name}: empty result proves nothing"

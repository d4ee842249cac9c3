"""Set operators (SURVEY.md §2.7).

Reference idioms: list.extend page accumulation, pd.concat summary
appends, Python set algebra over id sets. Spark: unionByName keeps
schema alignment explicit; EXCEPT/INTERSECT compile to anti/semi
joins which AQE will broadcast when one side is small.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_append(*dfs: DataFrame) -> DataFrame:
    """Accumulate page/summary frames.

    Reference: ``complete_list.extend``
    (scripts/bdc/get_bdc_studies_from_gen3.py:66);
    ``pd.concat([summary_df, result_df])``
    (scripts/bdc/run_dbgap_xml_gen_fallback.py:459, 481).
    """
    return reduce(lambda a, b: a.unionByName(b), dfs)


def except_ids(left: DataFrame, right: DataFrame) -> DataFrame:
    """Distinct set difference.

    ``left.distinct()`` FIRST: ``exceptAll`` is multiset subtraction
    (removes one right occurrence per left occurrence), so on an
    undeduplicated left a value appearing twice on the left and once
    on the right would survive — not a set difference, and not SQL
    EXCEPT. Distinct-then-exceptAll is exact set semantics whatever
    the input multiplicities.

    Reference: ``set(metadata_ids) - set(datadict_ids)``
    (scripts/heal/get_heal_platform_mds_data_dicts.py:106, 229).
    """
    return left.distinct().exceptAll(right.distinct())


def intersect_ids(left: DataFrame, right: DataFrame) -> DataFrame:
    """Reference: Gen3 ∩ PicSure study ids
    (scripts/bdc/run_dbgap_xml_gen_fallback.py:106)."""
    return left.intersect(right)


def distinct_rows(df: DataFrame) -> DataFrame:
    """Reference: ``set()`` dedup of ids/programs/filenames
    (scripts/bdc/get_bdc_studies_from_gen3.py:77, 236)."""
    return df.distinct()

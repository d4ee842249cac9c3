"""Pipelines: the reference's three entry points re-expressed as
DataFrame lineages (SURVEY.md §3).

EP1 bdc.py — validate → join → group → render-XML → summary
EP2 heal.py — normalize-aliases → explode dds/fields → enum maps →
              XML + variable index + KGX
EP3 lakefs_index.py — scan → parse → explode → group → pivot (the
              flagship query shape)
"""

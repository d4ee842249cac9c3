"""Operator library: one module per SURVEY.md §2 family.

Every operator is a pure ``DataFrame -> DataFrame`` function or a
``Column``-expression builder — no module-global state (unlike the
reference's accumulation into module globals, e.g.
scripts/lakefs/generate_lakefs_dbgap_xml_index.py:76-79), no eval
(unlike scripts/bdc/xml_generator.py:146), errors become quarantine
rows instead of aborts.
"""

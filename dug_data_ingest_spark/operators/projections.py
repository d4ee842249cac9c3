"""Projection / derivation operators (SURVEY.md §2.2).

The reference implements each of these as a row-wise Python helper;
here they are pure Column expressions so they fold into whole-stage
codegen and cost ~nothing at scale.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def derive_study_id(accession: Column, sep: str = r"\.") -> Column:
    """``study_id = accession.split('.')[0]``.

    Reference: scripts/bdc/run_dbgap_xml_gen_fallback.py:69,
    scripts/bdc/xml_generator.py:20.
    """
    return F.split(accession, sep).getItem(0)


def version_of_accession(accession: Column, default: str = "v1") -> Column:
    """Version component of an accession, defaulting when absent.

    Reference: ``extract_version_from_accession``
    (scripts/bdc/xml_generator.py:25-32).
    """
    parts = F.split(accession, r"\.")
    return F.when(F.size(parts) >= 2, parts.getItem(1)).otherwise(F.lit(default))


def coalesce_name(*candidates: Column, default: str = "(no name)") -> Column:
    """Prefer the first non-null / non-blank candidate name.

    Reference: ``get_study_name`` full_name → name → short_name →
    "(no name)" (scripts/bdc/get_bdc_studies_from_gen3.py:142-160;
    clone at get_bdc_studies_md_from_gen3.py:121-129).
    """
    cleaned = [F.when(F.trim(c) != "", c) for c in candidates]
    return F.coalesce(*cleaned, F.lit(default))


def alias_fields(candidates: Iterable[Column], default: Column | None = None) -> Column:
    """Normalize field aliases (``name``|``property``,
    ``section``|``module``|``node``) by coalescing candidates.

    Reference: ``translate_data_dictionary_field``
    (scripts/heal/get_heal_platform_mds_data_dicts.py:36-63).
    """
    cols = list(candidates)
    if default is not None:
        cols.append(default)
    return F.coalesce(*cols)


def normalize_program(program: Column, default: str = "unknown_program") -> Column:
    """First of a pipe-list, trimmed, spaces and '/' → '_', lowered;
    null/blank → ``unknown_program``.

    Reference: ``get_program_dir``
    (scripts/bdc/run_dbgap_xml_gen_fallback.py:164-179).
    """
    first = F.trim(F.split(program, r"\|").getItem(0))
    norm = F.lower(F.regexp_replace(first, r"[ /]", "_"))
    return F.when(norm.isNull() | (norm == ""), F.lit(default)).otherwise(norm)


def program_from_authz(authz: Column, group: int = 1) -> Column:
    """Extract program (group 1) or project (group 2) from an authz
    path ``/programs/X/projects/Y``.

    Reference: scripts/bdc/get_bdc_studies_from_gen3.py:201-208;
    scripts/bdc/get_bdc_studies_md_from_gen3.py:132-138.
    """
    return F.regexp_extract(authz, r"^/programs/(.*)/projects/(.*)$", group)


def safe_text(col: Column, default: str = "") -> Column:
    """NaN/null → default string, everything else cast to string.

    Reference: ``safe_text`` (scripts/bdc/xml_generator.py:57-61).
    """
    return F.coalesce(col.cast("string"), F.lit(default))


def tag_first(tags: Column, field: str = "name", default: str | None = None) -> Column:
    """First tag's ``name`` (program inference).

    ``F.get`` (not ``getItem``): an EMPTY tags array is exactly the
    case the reference answers with the default, but under ANSI mode
    (Spark 4's default) ``getItem(0)`` on an empty array throws
    INVALID_ARRAY_INDEX and the default could never apply; ``get``
    returns NULL out-of-bounds, which the coalesce then fills.

    Reference: ``get_program``
    (scripts/bdc/get_bdc_studies_from_gen3.py:172-178).
    """
    first = F.get(tags, 0)
    v = first.getField(field) if field else first
    return F.coalesce(v, F.lit(default)) if default is not None else v

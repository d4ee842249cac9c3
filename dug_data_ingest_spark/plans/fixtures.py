"""Deterministic reference-shaped fixture tables (FIXTURES.md §B).

Seeded, pure-Python row synthesis → ``spark.createDataFrame``; no
network, no files. Edge-case mix mirrors FIXTURES.md: ~10% of rows
exercise each validation / fallback path so the pipeline plans
(plans/bdc.py, plans/heal.py) hit every branch in tests.

These model the INPUTS the reference fetches from Gen3 / PicSure /
HEAL MDS (columns fixed at scripts/bdc/get_bdc_studies_from_gen3.py:247-250,
scripts/bdc/get_bdc_studies_md_from_picsure.py:40-46,
scripts/heal/get_heal_platform_mds_data_dicts.py:504); tests replay
the pipelines on them exactly as the fixture-replayable fetch stages
(sources/rest.py) would at production scale.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

GEN3_SCHEMA = T.StructType(
    [
        T.StructField("Accession", T.StringType()),
        T.StructField("Consent", T.StringType()),
        T.StructField("Study Name", T.StringType()),
        T.StructField("Program", T.StringType()),
        T.StructField("Last modified", T.StringType()),
        T.StructField("Notes", T.StringType()),
        T.StructField("Description", T.StringType()),
    ]
)

PICSURE_SCHEMA = T.StructType(
    [
        T.StructField("studyId", T.StringType()),
        T.StructField("dtId", T.StringType()),
        T.StructField("varId", T.StringType()),
        T.StructField("derived_var_name", T.StringType()),
        T.StructField("derived_group_name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("columnmeta_name", T.StringType()),
        T.StructField("columnmeta_description", T.StringType()),
        T.StructField("columnmeta_var_group_description", T.StringType()),
        T.StructField("is_categorical", T.BooleanType()),
        T.StructField("values", T.StringType()),
    ]
)

HEAL_FIELDS_SCHEMA = T.StructType(
    [
        T.StructField("hdp_id", T.StringType()),
        T.StructField("dd_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("property", T.StringType()),
        T.StructField("section", T.StringType()),
        T.StructField("module", T.StringType()),
        T.StructField("node", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("minimum", T.DoubleType()),
        T.StructField("maximum", T.DoubleType()),
        T.StructField("enum", T.ArrayType(T.StringType())),
        T.StructField("enumLabels", T.MapType(T.StringType(), T.StringType())),
        T.StructField("encodings", T.StringType()),
        T.StructField("ord", T.IntegerType()),
    ]
)

HEAL_STUDIES_SCHEMA = T.StructType(
    [
        T.StructField("hdp_id", T.StringType()),
        T.StructField("appl_id", T.StringType()),
        T.StructField("project_title", T.StringType()),
        T.StructField("research_program", T.StringType()),
        T.StructField("study_name", T.StringType()),
        T.StructField("study_description", T.StringType()),
        T.StructField("data_dictionaries", T.MapType(T.StringType(), T.StringType())),
    ]
)

HDP_MAPPING_SCHEMA = T.StructType(
    [
        T.StructField("HDPID", T.StringType()),
        T.StructField("in_network", T.StringType()),
        T.StructField("study_type", T.StringType()),
        T.StructField("network_name", T.StringType()),
    ]
)

PROGRAMS = ["TOPMed", "COVID 19", "BioLINCC", "parent|topmed", "RECOVER/Adult", ""]


def gen3_studies(spark: SparkSession, n: int = 60, seed: int = 7) -> DataFrame:
    """B1: study rows; ~10% non-phs accessions, ~10% missing a
    required field (name/description), pipe/slash/space programs."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        base = f"phs{i:06d}"
        acc = f"{base}.v{rng.randint(1, 30)}.p{rng.randint(1, 3)}"
        if i % 10 == 3:
            acc = f"study-{i}"  # non-dbGaP id → filtered by regex
        elif i % 10 == 7:
            acc = base  # bare id, no version
        consent = f"c{rng.randint(1, 4)}" if i % 3 else ""
        name = "" if i % 10 == 5 else f"Study {i}"
        desc = "" if i % 10 == 6 else f"Description of study {i}."
        rows.append(
            (
                acc,
                consent,
                name,
                PROGRAMS[i % len(PROGRAMS)],
                f"2024-{(i % 12) + 1:02d}-01" if i % 4 else "",
                f"Name: Study {i}, short name: S{i}.",
                desc,
            )
        )
    return spark.createDataFrame(rows, GEN3_SCHEMA)


def picsure_variables(spark: SparkSession, n_studies: int = 60, seed: int = 11) -> DataFrame:
    """B2: variable rows; covers null dtId/varId, non-phv varIds,
    stringified-list values, studies absent from B1 (id >= n_studies)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_studies + 10):  # 10 studies only PicSure knows
        sid = f"phs{i:06d}"
        if i % 9 == 4:
            continue  # studies with no variables at all
        for t in range(rng.randint(1, 3)):
            dt = f"pht{i:04d}{t:02d}"
            for v in range(rng.randint(2, 6)):
                var = f"phv{i:04d}{t:02d}{v:02d}"
                if (i + v) % 17 == 0:
                    var = None  # cleaned out
                elif (i + v) % 13 == 0:
                    var = f"bad{i}{v}"  # non-phv → cleaned out
                cat = (i + v) % 2 == 0
                rows.append(
                    (
                        sid,
                        None if (i + t) % 19 == 0 else dt,
                        var,
                        f"var_{i}_{t}_{v}",
                        None if t % 5 == 4 else f"group_{i}_{t}",
                        f"desc {i}.{t}.{v}",
                        f"VAR{i}_{t}_{v}",
                        f"meta desc {i}.{t}.{v}",
                        f"group desc {i}.{t}" if v == 0 else None,
                        cat,
                        "['Male', 'Female', 'Other']" if cat else None,
                    )
                )
    return spark.createDataFrame(rows, PICSURE_SCHEMA)


def heal_studies(spark: SparkSession, n: int = 40, seed: int = 13) -> DataFrame:
    """B3 (flattened one level): nested doc fields the HEAL pipeline
    actually navigates, incl. the label→dd_id map; ~10% without dds,
    one dd id referenced but absent from heal_fields (404 path)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        hdp = f"HDP{i:05d}"
        dds = None
        if i % 10 != 2:
            # dd count is a pure function of i so heal_fields agrees
            dds = {
                f"dict {i}.{d}": f"dd-{i:03d}-{d}" for d in range((i % 3) + 1)
            }
        if i % 10 == 8 and dds:
            dds["ghost"] = f"dd-missing-{i}"  # referenced, never fetched
        rows.append(
            (
                hdp,
                f"1002{i:04d}" if i % 10 else None,
                f"Project title {i}",
                "" if i % 7 == 3 else f"Program {i % 4}",
                f"HEAL Study {i}",
                f"Long description {i}.",
                dds,
            )
        )
    return spark.createDataFrame(rows, HEAL_STUDIES_SCHEMA)


def heal_fields(spark: SparkSession, n_studies: int = 40, seed: int = 17) -> DataFrame:
    """B4: field rows with alias pairs (name|property,
    section|module|node), duplicate names across dds within a study
    (uniquify target), enum/enumLabels with missing-label codes, and
    legacy pipe-encodings rows."""
    rng = random.Random(seed)
    rows = []
    ordinal = 0
    for i in range(n_studies):
        if i % 10 == 2:
            continue  # study without dds
        for d in range((i % 3) + 1):  # same dd count as heal_studies
            dd = f"dd-{i:03d}-{d}"
            for v in range(rng.randint(2, 5)):
                # duplicate names on purpose: same name across dds
                base_name = f"field_{i}_{v % 3}"
                use_property = (i + v) % 4 == 1
                sec = mod = node = None
                which = (i + d + v) % 4
                if which == 0:
                    sec = f"Section{v % 2}"
                elif which == 1:
                    mod = f"Module{v % 2}"
                elif which == 2:
                    node = f"Node{v % 2}"
                has_enum = (i + v) % 3 == 0
                enum = ["1", "2", "9"] if has_enum else None
                labels = {"1": "Yes", "2": "No"} if has_enum else None  # 9 missing
                enc = None if has_enum or (i + v) % 5 else "1=Male|2=Female"
                rows.append(
                    (
                        f"HDP{i:05d}",
                        dd,
                        None if use_property else base_name,
                        base_name if use_property else None,
                        sec,
                        mod,
                        node,
                        f"Title {i}.{d}.{v}" if v % 3 else None,
                        f"Field desc {i}.{d}.{v}",
                        "integer" if (i + v) % 2 else "string",
                        float(v) if has_enum else None,
                        float(v + 10) if has_enum else None,
                        enum,
                        labels,
                        enc,
                        ordinal,
                    )
                )
                ordinal += 1
    return spark.createDataFrame(rows, HEAL_FIELDS_SCHEMA)


def hdp_mapping(spark: SparkSession, n: int = 30, seed: int = 19) -> DataFrame:
    """B6: research-network mapping (broadcast side); deliberately
    covers only some HDP ids (KeyError path → left join null)."""
    rng = random.Random(seed)
    rows = []
    for i in range(0, n * 2, 2):  # even ids only → odd ids unmapped
        in_net = "Yes" if rng.random() < 0.5 else "No"
        rows.append(
            (
                f"HDP{i:05d}",
                in_net,
                "HEAL Research Network" if in_net == "Yes" else "HEAL Studies",
                f"Network {i % 5}" if in_net == "Yes" else "",
            )
        )
    return spark.createDataFrame(rows, HDP_MAPPING_SCHEMA)

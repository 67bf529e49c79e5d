"""Knowledge-graph relationship model: the app-level 14-type
registry with per-type entity constraints, the name-keyword entity
typer, and the Cypher property serialization rules.

Reference behavior (app/models/relationships.py):
- ``RelationshipType`` (:11-219): 14 relationship types, each a
  (label, source_types, target_types, suggested_properties) tuple;
  ``validate_entities`` (:213-218) accepts a (source, target) pair
  when each side is listed OR the side's list contains "Any";
  ``get_by_label`` (:206-211) returns None for unknown labels.
- ``get_entity_type`` (:306-341): metadata["type"] override first,
  then ordered SUBSTRING keyword probes of the lower-cased name —
  Product, Component, Software, Department, Document — default
  "Entity". Containment is raw substring (``"app" in "apple"``), not
  word-boundary; that quirk is preserved.
- ``Relationship.to_cypher_properties`` (:250-270): 5 core fields
  always present; page_number/section/validator appended only when
  TRUTHY (page_number=0 is dropped — quirk preserved); then all
  additional properties merged on top.

Spark form: every rule is a pure Column expression (F.when chains,
array_contains over a broadcast literal matrix) — whole-stage
codegen, no UDF, no shuffle beyond whatever aggregation the caller
adds. Each builder has a DuckDB SQL twin generated from the SAME
Python tables so the oracle cannot drift from the Spark logic.

Scale: the 14-row matrix joins as a broadcast literal; the entity
typer is a per-row expression, so typed validation over N candidate
relationships is one narrow map stage at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# -- 14-type registry (relationships.py:11-219) -------------------------------
# label -> (source_types, target_types, suggested_property_keys)

REL_TYPES: dict[str, tuple[tuple[str, ...], tuple[str, ...], tuple[str, ...]]] = {
    "COMPONENT_OF": (
        ("Component", "Feature", "Module"),
        ("Product", "System", "Component"),
        ("component_type", "quantity", "optional", "position"),
    ),
    "CONNECTS_TO": (
        ("Product", "Component", "System", "Software"),
        ("Product", "Component", "System", "Platform"),
        ("connection_type", "protocol", "bidirectional", "required",
         "max_distance", "bandwidth"),
    ),
    "DEPENDS_ON": (
        ("Product", "Component", "Feature", "Process", "Software"),
        ("Component", "Service", "Resource", "Infrastructure"),
        ("dependency_type", "version", "critical", "fallback",
         "performance_impact"),
    ),
    "REPLACES": (
        ("Product", "Component", "Software", "Document"),
        ("Product", "Component", "Software", "Document"),
        ("migration_required", "backwards_compatible", "deprecation_date",
         "reason", "upgrade_path"),
    ),
    "TROUBLESHOOTS": (
        ("Document", "Procedure", "Guide"),
        ("Issue", "Error", "Problem", "Component"),
        ("error_code", "severity", "frequency", "resolution_time",
         "success_rate", "symptoms"),
    ),
    "DEFINES": (
        ("Document", "Specification", "Standard"),
        ("Concept", "Process", "Standard", "Value", "Term"),
        ("definition_type", "authority_level", "scope", "version"),
    ),
    "DOCUMENTS": (
        ("Document", "Guide", "Manual"),
        ("Product", "Process", "Feature", "System"),
        ("documentation_type", "detail_level", "version", "last_updated"),
    ),
    "REFERENCES": (
        ("Document", "Specification", "Report"),
        ("Document", "Standard", "Source", "Study"),
        ("reference_type", "page", "url", "relevance"),
    ),
    "TARGETS": (
        ("Document", "Campaign", "Feature", "Product"),
        ("Segment", "Department", "UserType", "Market"),
        ("segment_size", "priority", "strategy", "maturity",
         "effectiveness"),
    ),
    "RESPONSIBLE_FOR": (
        ("Department", "Team", "Person", "Role"),
        ("Product", "Process", "Component", "Customer", "Document"),
        ("responsibility_type", "since", "sla", "contact", "escalation"),
    ),
    "SERVES": (
        ("Product", "Feature", "Service", "Department"),
        ("Customer", "Market", "Segment", "Region"),
        ("service_type", "tier", "region", "contract_type", "revenue"),
    ),
    "IMPACTS": (
        ("Issue", "Change", "Feature", "Decision"),
        ("Product", "Customer", "Process", "Component"),
        ("impact_type", "severity", "timeframe", "measurable",
         "mitigation"),
    ),
    "RELATES_TO": (
        ("Any",),
        ("Any",),
        ("relationship_type", "description", "strength"),
    ),
    "COMPATIBLE_WITH": (
        ("Product", "Component", "Software", "Accessory"),
        ("Product", "Component", "Software", "Standard"),
        ("compatibility_level", "version_range", "requirements", "tested",
         "certification"),
    ),
}

# -- entity typer keyword tables (relationships.py:306-341) --------------------
# Order is load-bearing: the reference returns on the FIRST hit.

ENTITY_TYPE_KEYWORDS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("Product", ("model", "x500", "x600", "dispenser", "product")),
    ("Component", ("sensor", "pump", "filter", "module", "board", "valve")),
    ("Software", ("firmware", "app", "software", "api", "platform")),
    ("Department", ("sales", "marketing", "engineering", "support",
                    "finance", "supply", "logistics")),
    ("Document", ("document", "manual", "guide", "spec", "report")),
)
DEFAULT_ENTITY_TYPE = "Entity"


def get_entity_type(name: str, meta_type: str | None = None) -> str:
    """Driver-side twin (relationships.py:306-341) for tests.
    ``meta_type=None`` means the metadata has no "type" key; a
    present-but-empty value is returned verbatim (reference checks
    key membership, not truthiness)."""
    if meta_type is not None:
        return meta_type
    low = name.lower()
    for ty, kws in ENTITY_TYPE_KEYWORDS:
        if any(k in low for k in kws):
            return ty
    return DEFAULT_ENTITY_TYPE


def entity_type_col(name_col, meta_type_col=None) -> Column:
    """``get_entity_type`` as a pure expression: metadata override
    first, then ordered substring probes of lower(name), else
    'Entity'. NULL in the meta column means "type key absent"; a
    present-but-empty type IS returned verbatim (the reference checks
    ``"type" in entity_metadata``, not truthiness of the value —
    quirk preserved)."""
    name = F.col(name_col) if isinstance(name_col, str) else name_col
    low = F.lower(name)
    out = F.lit(DEFAULT_ENTITY_TYPE)
    for ty, kws in reversed(ENTITY_TYPE_KEYWORDS):
        cond = None
        for k in kws:
            c = low.contains(k)
            cond = c if cond is None else (cond | c)
        out = F.when(cond, F.lit(ty)).otherwise(out)
    if meta_type_col is not None:
        meta = (
            F.col(meta_type_col)
            if isinstance(meta_type_col, str)
            else meta_type_col
        )
        out = F.when(meta.isNotNull(), meta).otherwise(out)
    return out


def entity_type_sql(name_expr: str, meta_expr: str | None = None) -> str:
    """DuckDB twin generated from the same keyword tables."""
    branches = " ".join(
        "WHEN "
        + " OR ".join(f"contains(lower({name_expr}), '{k}')" for k in kws)
        + f" THEN '{ty}'"
        for ty, kws in ENTITY_TYPE_KEYWORDS
    )
    case = f"CASE {branches} ELSE '{DEFAULT_ENTITY_TYPE}' END"
    if meta_expr is None:
        return case
    return (
        f"CASE WHEN {meta_expr} IS NOT NULL "
        f"THEN {meta_expr} ELSE {case} END"
    )


# -- the matrix as a joinable table --------------------------------------------


def rel_types_df(spark: SparkSession) -> DataFrame:
    """The 14-row registry as a (broadcastable) DataFrame:
    (label, source_types array, target_types array, n_suggested_props)."""
    import pandas as pd

    rows = [
        (label, list(src), list(tgt), len(props))
        for label, (src, tgt, props) in REL_TYPES.items()
    ]
    # via pandas+Arrow → a LocalRelation in the plan; a Python-list
    # createDataFrame would re-run a 32-task RDD job per execution
    pdf = pd.DataFrame(
        rows,
        columns=["label", "source_types", "target_types",
                 "n_suggested_props"],
        dtype=object,
    )
    return spark.createDataFrame(
        pdf,
        "label string, source_types array<string>, "
        "target_types array<string>, n_suggested_props int",
    )


def rel_types_values_sql() -> str:
    """The same registry as a DuckDB VALUES table
    ``(label, source_types, target_types, n_suggested_props)``."""
    rows = ", ".join(
        "('{l}', [{s}], [{t}], {n})".format(
            l=label,
            s=", ".join(f"'{x}'" for x in src),
            t=", ".join(f"'{x}'" for x in tgt),
            n=len(props),
        )
        for label, (src, tgt, props) in REL_TYPES.items()
    )
    return (
        f"(VALUES {rows}) AS rel_types"
        "(label, source_types, target_types, n_suggested_props)"
    )


def validate_entities_col(src_type, tgt_type) -> Column:
    """``validate_entities`` (:213-218) against joined
    source_types/target_types array columns: each side passes when
    the list contains 'Any' or the concrete type."""
    src = F.col(src_type) if isinstance(src_type, str) else src_type
    tgt = F.col(tgt_type) if isinstance(tgt_type, str) else tgt_type
    ok_src = F.array_contains("source_types", "Any") | F.array_contains(
        F.col("source_types"), src
    )
    ok_tgt = F.array_contains("target_types", "Any") | F.array_contains(
        F.col("target_types"), tgt
    )
    return ok_src & ok_tgt


VALIDATE_SQL = (
    "((list_contains(source_types, 'Any') OR list_contains(source_types, {src}))"
    " AND (list_contains(target_types, 'Any')"
    " OR list_contains(target_types, {tgt})))"
)


# -- Cypher property serialization (relationships.py:250-270) ------------------

N_CORE_CYPHER_PROPS = 5  # confidence, source_text, extracted_at,
                         # extraction_method, validated


def cypher_props_count_col(page_number, section, validator, n_additional) -> Column:
    """Property count after ``to_cypher_properties``: 5 core fields,
    plus page_number/section/validator ONLY when truthy (0 / '' /
    NULL dropped), plus the additional-props dict (whose keys the
    reference assumes distinct from the built-ins)."""
    pn = F.col(page_number) if isinstance(page_number, str) else page_number
    sec = F.col(section) if isinstance(section, str) else section
    val = F.col(validator) if isinstance(validator, str) else validator
    extra = (
        F.col(n_additional) if isinstance(n_additional, str) else n_additional
    )
    truthy_int = F.when(pn.isNotNull() & (pn != 0), 1).otherwise(0)
    truthy_str = lambda c: F.when(  # noqa: E731
        c.isNotNull() & (F.length(c) > 0), 1
    ).otherwise(0)
    return (
        F.lit(N_CORE_CYPHER_PROPS)
        + truthy_int
        + truthy_str(sec)
        + truthy_str(val)
        + extra
    ).cast("int")

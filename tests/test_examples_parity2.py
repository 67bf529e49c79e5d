"""Round-8 example parity: the ExtractByLlm family + face_recognition
(r7 verdict directives #2 and #7). Same contract as
test_examples_parity.py — each test rebuilds one reference example
flow shape-for-shape on this engine:

- examples/manuals_llm_extraction/main.py: LocalFile(binary) PDFs →
  PdfToMarkdown → ExtractByLlm(ModuleInfo: nested classes/methods/
  args dataclasses) → summarize_module → collect(filename,
  module_info, module_summary) → Postgres target keyed by filename.
- examples/paper_metadata/main.py: extract_basic_info (num_pages +
  first page) → first-page markdown → ExtractByLlm(PaperMetadata) →
  THREE collectors: paper_metadata (PK filename), author_papers
  (per-author rows, PK author_name+filename), metadata_embeddings
  (title + abstract chunks via SplitRecursively with a CUSTOM
  language spec, GeneratedField.UUID, cosine index).
- examples/patient_intake_extraction/main.py: ToMarkdown(content,
  filename) → ExtractByLlm(Patient: the deepest schema in the
  examples — nested Address/Contact/Insurance/Pharmacy, four list
  fields, date + nullable date) → collect(filename, patient_info).
- examples/multi_format_indexing/main.py: file_to_pages MIME dispatch
  (pdf → per-page images, image/* → one page, else []) → per-page
  ColPali multi-vector embed → collect(id=UUID, filename, page,
  embedding) → Qdrant target.
- examples/pdf_embedding/main.py: PdfToMarkdown → SplitRecursively
  (markdown 2000/500) → shared text_to_embedding transform-flow →
  collect(id=UUID, filename, location, text, embedding) → cosine
  search on the exported table.
- examples/text_embedding_qdrant/main.py: markdown LocalFile →
  chunks → embed → collect with the NAMED vector (text_embedding) →
  Qdrant collection keyed by id; query side searches the named
  vector.
- examples/face_recognition/main.py: LocalFile(binary) images →
  extract_faces (list[FaceBase] — LTable semantics: per-image rows) →
  per-face embedding → collect(id=UUID, filename, rect, embedding) →
  Qdrant target.

The marker/markitdown/face_recognition/OpenAI calls are the
documented deterministic doubles (none of those libs/models are in
this environment); everything around them — binary source listing,
JSON-schema build + from_json structured parse, chunk geometry,
custom language stacks, collector/auto-UUID/export mechanics, MERGE
idempotency, cosine search — is the real engine path.
"""

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cocoindex_data_ingestion_spark.operators import chunking
from cocoindex_data_ingestion_spark.operators.embedding import (
    hash_embed_series,
    hash_embedder,
    multi_vector_hash_embedder,
)
from cocoindex_data_ingestion_spark.operators.extract import extract_by_llm
from cocoindex_data_ingestion_spark.plans.flow import Flow
from cocoindex_data_ingestion_spark.sinks import VectorSink
from cocoindex_data_ingestion_spark.sources.localfile import read_local_files

DIM = 32


# -- deterministic PdfToMarkdown double ----------------------------------------
# fake "PDF": b"%PDF-FAKE\n" + utf-8 markdown payload. The double
# (stand-in for marker's PdfConverter, examples/manuals_llm_extraction
# /main.py:16-33) just strips the header — deterministic, exercises
# the binary→string transform seam with real Arrow batching.

_PDF_HEADER = b"%PDF-FAKE\n"


def _fake_pdf(md: str) -> bytes:
    return _PDF_HEADER + md.encode("utf-8")


def _pdf_to_markdown_col():
    hdr_len = len(_PDF_HEADER)  # closure-captured: the udf ships by
    # value (this test module is not importable on executors)

    @F.pandas_udf("string")
    def conv(content: pd.Series) -> pd.Series:
        return content.map(lambda b: bytes(b)[hdr_len:].decode("utf-8"))

    return conv


# ---------------------------------------------------------------- manuals


_MANUALS = {
    "argparse.pdf": _fake_pdf(
        "# argparse\nCommand line parsing.\n"
        "## class ArgumentParser | builds parsers\n"
        "- method add_argument(name:flag,action:what) | register\n"
        "- method parse_args(args:argv) | run\n"
        "## class Namespace | result holder\n"
        "- def get_default(dest:key) | module-level helper\n"
    ),
    "heapq.pdf": _fake_pdf(
        "# heapq\nHeap queue algorithm.\n"
        "- def heappush(heap:list,item:obj) | push\n"
        "- def heappop(heap:list) | pop\n"
    ),
}

_ARG_T = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
    ]
)
_METHOD_T = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("args", T.ArrayType(_ARG_T)),
        T.StructField("description", T.StringType()),
    ]
)
_CLASS_T = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("methods", T.ArrayType(_METHOD_T)),
    ]
)
_MODULE_T = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("classes", T.ArrayType(_CLASS_T)),
        T.StructField("methods", T.ArrayType(_METHOD_T)),
    ]
)


def _manuals_llm_factory():
    """Deterministic ExtractByLlm double: parses the synthetic manual
    markdown into the declared ModuleInfo shape. Built as a closure so
    cloudpickle ships it by value to executors."""

    def parse_method(line: str) -> dict:
        # "- method name(a:d1,b:d2) | desc" / "- def name(...) | desc"
        body = line.split(" ", 2)[2]
        sig, desc = body.split(" | ", 1)
        name, argstr = sig.split("(", 1)
        argstr = argstr.rstrip(")")
        args = [
            {"name": a.split(":")[0], "description": a.split(":")[1]}
            for a in argstr.split(",")
            if a
        ]
        return {"name": name, "args": args, "description": desc}

    def manuals_llm(texts: pd.Series, schema: dict) -> pd.Series:
        out = []
        for t in texts:
            lines = (t or "").splitlines()
            title = lines[0].lstrip("# ").strip() if lines else ""
            description = lines[1] if len(lines) > 1 else ""
            classes, methods = [], []
            cur = None
            for ln in lines[2:]:
                if ln.startswith("## class "):
                    name, desc = ln[len("## class "):].split(" | ", 1)
                    cur = {"name": name, "description": desc, "methods": []}
                    classes.append(cur)
                elif ln.startswith("- method "):
                    cur["methods"].append(parse_method(ln))
                elif ln.startswith("- def "):
                    methods.append(parse_method(ln))
            out.append(
                json.dumps(
                    {
                        "title": title,
                        "description": description,
                        "classes": classes,
                        "methods": methods,
                    }
                )
            )
        return pd.Series(out, dtype="object")

    return manuals_llm


def test_manuals_llm_extraction_example_flow(spark, tmp_path):
    src = tmp_path / "manuals"
    src.mkdir()
    for name, blob in _MANUALS.items():
        (src / name).write_bytes(blob)

    files = read_local_files(spark, str(src), binary=True)
    assert files.count() == 2

    flow = Flow("ManualExtraction")
    flow.add_source("documents", files, key_cols=["path"])

    docs = files.select(
        "path", "filename", _pdf_to_markdown_col()(F.col("content")).alias("markdown")
    )
    info = extract_by_llm(
        docs,
        _MODULE_T,
        llm_fn=_manuals_llm_factory(),
        instruction="Please extract Python module information from the manual.",
        id_col="path",
        text_col="markdown",
    )
    # summarize_module (main.py:81-88): num_classes / num_methods
    rows = info.join(docs.select("path", "filename"), "path").select(
        "filename",
        F.col("extracted").alias("module_info"),
        F.struct(
            F.size("extracted.classes").alias("num_classes"),
            F.size("extracted.methods").alias("num_methods"),
        ).alias("module_summary"),
    )
    flow._add_to_collector("modules_index", rows)
    flow.export("modules_index", "modules_info", primary_key=["filename"])

    got = {
        r["filename"]: r
        for r in flow.collector("modules_index").collect()
    }
    arg = got["argparse.pdf"]
    assert arg["module_info"]["title"] == "argparse"
    assert arg["module_summary"]["num_classes"] == 2
    assert arg["module_summary"]["num_methods"] == 1
    cls = {c["name"]: c for c in arg["module_info"]["classes"]}
    assert cls["ArgumentParser"]["methods"][0]["name"] == "add_argument"
    assert [a["name"] for a in cls["ArgumentParser"]["methods"][0]["args"]] == [
        "name", "action",
    ]
    hp = got["heapq.pdf"]
    assert hp["module_summary"]["num_classes"] == 0
    assert hp["module_summary"]["num_methods"] == 2
    assert hp["module_info"]["methods"][1]["args"][0]["name"] == "heap"


# ---------------------------------------------------------------- papers


_PAPER_T = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField(
            "authors",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("email", T.StringType()),
                        T.StructField("affiliation", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("abstract", T.StringType()),
    ]
)

# abstract long enough to multi-chunk at 500/200/150
_ABSTRACT = (
    "We study declarative dataframe engines at cluster scale. "
    "Optimizers rewrite joins, push filters, and prune columns. "
    "Adaptive execution re-plans shuffles at runtime; skewed keys "
    "are salted. We measure throughput on a thousand executors. "
    "Results show near-linear scaling for pipelined operators! "
    "Barrier stages dominate the tail, and broadcast joins remove "
    "most exchanges? Costs fall as partial aggregation widens. "
    "We conclude with guidance for partition sizing, bucketing, "
    "and watermark selection in continuous pipelines."
)

_PAPERS = {
    "engines.pdf": _fake_pdf(
        "title: Scaling Declarative Engines\n"
        "author: Ada Lovelace <ada@calc.org> (Analytical)\n"
        "author: Charles Babbage (Analytical)\n"
        f"abstract: {_ABSTRACT}\n"
        "PAGEBREAK\nbody page two\nPAGEBREAK\nbody page three\n"
    ),
    "ducks.pdf": _fake_pdf(
        "title: In-Process OLAP\n"
        "author: Grace Hopper <grace@navy.mil>\n"
        "abstract: Short abstract fits in one chunk.\n"
        "PAGEBREAK\nsecond page\n"
    ),
}


def _papers_llm_factory():
    """Deterministic PaperMetadata double — nested so cloudpickle
    ships it by value to executors."""

    def papers_llm(texts: pd.Series, schema: dict) -> pd.Series:
        out = []
        for t in texts:
            title, authors, abstract = "", [], ""
            for ln in (t or "").splitlines():
                if ln.startswith("title: "):
                    title = ln[7:]
                elif ln.startswith("author: "):
                    rest = ln[8:]
                    email = None
                    affiliation = None
                    if "<" in rest:
                        name, _, tail = rest.partition(" <")
                        email, _, tail = tail.partition(">")
                        rest = name + tail
                    if "(" in rest:
                        rest, _, aff = rest.partition("(")
                        affiliation = aff.rstrip(")")
                    authors.append(
                        {
                            "name": rest.strip(),
                            "email": email,
                            "affiliation": affiliation,
                        }
                    )
                elif ln.startswith("abstract: "):
                    abstract = ln[10:]
            out.append(
                json.dumps(
                    {"title": title, "authors": authors, "abstract": abstract}
                )
            )
        return pd.Series(out, dtype="object")

    return papers_llm


def test_paper_metadata_example_flow(spark, tmp_path):
    src = tmp_path / "papers"
    src.mkdir()
    for name, blob in _PAPERS.items():
        (src / name).write_bytes(blob)

    files = read_local_files(spark, str(src), binary=True)

    # extract_basic_info (main.py:29-39): page count + first page
    @F.pandas_udf(
        "struct<num_pages: int, first_page: binary>"
    )
    def basic_info(content: pd.Series) -> pd.DataFrame:
        def split(b: bytes):
            body = bytes(b)[len(_PDF_HEADER):]
            pages = body.split(b"PAGEBREAK\n")
            return len(pages), _PDF_HEADER + pages[0]

        rows = content.map(split)
        return pd.DataFrame(
            {
                "num_pages": rows.map(lambda r: r[0]),
                "first_page": rows.map(lambda r: r[1]),
            }
        )

    docs = files.select(
        "path", "filename", basic_info(F.col("content")).alias("basic_info")
    ).select(
        "path",
        "filename",
        "basic_info.num_pages",
        _pdf_to_markdown_col()(F.col("basic_info.first_page")).alias(
            "first_page_md"
        ),
    )
    meta = extract_by_llm(
        docs,
        _PAPER_T,
        llm_fn=_papers_llm_factory(),
        instruction="Please extract the metadata from the first page of the paper.",
        id_col="path",
        text_col="first_page_md",
    ).join(docs.select("path", "filename", "num_pages"), "path")

    flow = Flow("PaperMetadata")
    flow.add_source("documents", files, key_cols=["path"])

    # collector 1: paper_metadata (PK filename)
    flow._add_to_collector(
        "paper_metadata",
        meta.select(
            "filename",
            F.col("extracted.title").alias("title"),
            F.col("extracted.authors").alias("authors"),
            F.col("extracted.abstract").alias("abstract"),
            "num_pages",
        ),
    )
    # collector 2: author_papers (per-author rows)
    flow._add_to_collector(
        "author_papers",
        meta.select(
            F.explode("extracted.authors").alias("a"), "filename"
        ).select(F.col("a.name").alias("author_name"), "filename"),
    )
    # collector 3: metadata_embeddings — title row + abstract chunks
    # through SplitRecursively with the example's CUSTOM language
    # (main.py:128-140: [.?!]+\s+ / [:;]\s+ / ,\s+ / \s+)
    title_rows = meta.select(
        "filename",
        F.lit("title").alias("location"),
        F.col("extracted.title").alias("text"),
    )
    abstracts = meta.select(
        "path", F.col("extracted.abstract").alias("text")
    )
    chunks = chunking.chunk_recursive_dp(
        abstracts,
        chunk_size=500,
        min_chunk_size=200,
        chunk_overlap=150,
        language="abstract",
        custom_languages={
            "abstract": (r"[.?!]+\s+", r"[:;]\s+", r",\s+", r"\s+")
        },
        id_col="path",
        text_col="text",
    )
    chunk_rows = chunks.join(
        meta.select("path", "filename"), "path"
    ).select(
        "filename",
        F.lit("abstract").alias("location"),
        F.col("chunk_text").alias("text"),
    )
    emb_scope = flow.add_source(
        "emb_rows",
        title_rows.unionByName(chunk_rows).withColumn(
            "embedding", hash_embedder(DIM)(F.col("text"))
        ),
        key_cols=["filename", "location", "text"],
    )
    emb_scope.collect(
        "metadata_embeddings",
        {
            "filename": "filename",
            "location": "location",
            "text": "text",
            "embedding": "embedding",
        },
        auto_uuid_field="id",
    )

    papers = {
        r["filename"]: r for r in flow.collector("paper_metadata").collect()
    }
    eng = papers["engines.pdf"]
    assert eng["title"] == "Scaling Declarative Engines"
    assert eng["num_pages"] == 3
    assert [a["name"] for a in eng["authors"]] == [
        "Ada Lovelace", "Charles Babbage",
    ]
    assert eng["authors"][0]["email"] == "ada@calc.org"
    assert eng["authors"][1]["email"] is None
    assert papers["ducks.pdf"]["num_pages"] == 2

    ap = sorted(
        (r["author_name"], r["filename"])
        for r in flow.collector("author_papers").collect()
    )
    assert ap == [
        ("Ada Lovelace", "engines.pdf"),
        ("Charles Babbage", "engines.pdf"),
        ("Grace Hopper", "ducks.pdf"),
    ]

    emb = flow.collector("metadata_embeddings")
    rows = emb.collect()
    by_loc = {}
    for r in rows:
        by_loc.setdefault((r["filename"], r["location"]), []).append(r)
    assert len(by_loc[("engines.pdf", "title")]) == 1
    assert len(by_loc[("engines.pdf", "abstract")]) >= 2  # multi-chunk
    assert len(by_loc[("ducks.pdf", "abstract")]) == 1
    assert len({r["id"] for r in rows}) == len(rows)  # UUIDs distinct

    sink = VectorSink(
        spark,
        str(tmp_path / "metadata_embeddings"),
        key_cols=["id"],
        schema_ddl=(
            "id string, filename string, location string, text string, "
            "embedding array<float>"
        ),
        vector_cols={"embedding": DIM},
    )
    out = emb.select(
        "id", "filename", "location", "text",
        F.col("embedding").cast("array<float>"),
    )
    sink.merge(out)
    n = sink.read().count()
    sink.merge(out)
    assert sink.read().count() == n  # UUID-keyed MERGE idempotent


# ---------------------------------------------------------------- patients


_PATIENT_T = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("dob", T.DateType()),
        T.StructField("gender", T.StringType()),
        T.StructField(
            "address",
            T.StructType(
                [
                    T.StructField("street", T.StringType()),
                    T.StructField("city", T.StringType()),
                    T.StructField("state", T.StringType()),
                    T.StructField("zip_code", T.StringType()),
                ]
            ),
        ),
        T.StructField("phone", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("preferred_contact_method", T.StringType()),
        T.StructField(
            "emergency_contact",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("phone", T.StringType()),
                    T.StructField("relationship", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "insurance",
            T.StructType(
                [
                    T.StructField("provider", T.StringType()),
                    T.StructField("policy_number", T.StringType()),
                    T.StructField("group_number", T.StringType()),
                    T.StructField("policyholder_name", T.StringType()),
                    T.StructField(
                        "relationship_to_patient", T.StringType()
                    ),
                ]
            ),
        ),
        T.StructField("reason_for_visit", T.StringType()),
        T.StructField("symptoms_duration", T.StringType()),
        T.StructField(
            "past_conditions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("diagnosed", T.BooleanType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "current_medications",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("dosage", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "allergies",
            T.ArrayType(
                T.StructType([T.StructField("name", T.StringType())])
            ),
        ),
        T.StructField(
            "surgeries",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("date", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("occupation", T.StringType()),
        T.StructField(
            "pharmacy",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("phone", T.StringType()),
                    T.StructField(
                        "address",
                        T.StructType(
                            [
                                T.StructField("street", T.StringType()),
                                T.StructField("city", T.StringType()),
                                T.StructField("state", T.StringType()),
                                T.StructField(
                                    "zip_code", T.StringType()
                                ),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField("consent_given", T.BooleanType()),
        T.StructField("consent_date", T.DateType()),
    ]
)

_FORM_A = json.dumps(
    {
        "name": "Jordan Smith",
        "dob": "1984-03-12",
        "gender": "nonbinary",
        "address": {
            "street": "1 Elm St",
            "city": "Springfield",
            "state": "IL",
            "zip_code": "62701",
        },
        "phone": "555-0100",
        "email": "jordan@example.com",
        "preferred_contact_method": "email",
        "emergency_contact": {
            "name": "Casey Smith",
            "phone": "555-0101",
            "relationship": "sibling",
        },
        "insurance": {
            "provider": "Acme Health",
            "policy_number": "P-123",
            "group_number": None,
            "policyholder_name": "Jordan Smith",
            "relationship_to_patient": "self",
        },
        "reason_for_visit": "persistent cough",
        "symptoms_duration": "2 weeks",
        "past_conditions": [{"name": "asthma", "diagnosed": True}],
        "current_medications": [
            {"name": "albuterol", "dosage": "2 puffs"}
        ],
        "allergies": [{"name": "penicillin"}, {"name": "dust"}],
        "surgeries": [],
        "occupation": "teacher",
        "pharmacy": {
            "name": "Corner Drug",
            "phone": "555-0102",
            "address": {
                "street": "2 Oak Ave",
                "city": "Springfield",
                "state": "IL",
                "zip_code": "62702",
            },
        },
        "consent_given": True,
        "consent_date": "2024-05-01",
    }
)

_FORM_B = json.dumps(
    {
        "name": "Riley Chen",
        "dob": "1999-11-30",
        "gender": "female",
        "address": {
            "street": "9 Pine Rd",
            "city": "Madison",
            "state": "WI",
            "zip_code": "53703",
        },
        "phone": "555-0200",
        "email": "riley@example.com",
        "preferred_contact_method": "phone",
        "emergency_contact": {
            "name": "Sam Chen",
            "phone": "555-0201",
            "relationship": "parent",
        },
        "insurance": None,
        "reason_for_visit": "annual physical",
        "symptoms_duration": "none",
        "past_conditions": [],
        "current_medications": [],
        "allergies": [],
        "surgeries": [
            {"name": "appendectomy", "date": "2015-06-20"}
        ],
        "occupation": None,
        "pharmacy": None,
        "consent_given": False,
        "consent_date": None,
    }
)


def test_patient_intake_extraction_example_flow(spark, tmp_path):
    src = tmp_path / "patient_forms"
    src.mkdir()
    # fake intake forms: .docx-shaped binaries whose ToMarkdown double
    # (markitdown stand-in, main.py:91-110) yields the form text; the
    # LLM double re-emits it as the structured JSON
    (src / "form_a.docx").write_bytes(b"DOCX\n" + _FORM_A.encode())
    (src / "form_b.pdf").write_bytes(b"DOCX\n" + _FORM_B.encode())

    files = read_local_files(spark, str(src), binary=True)

    @F.pandas_udf("string")
    def to_markdown(content: pd.Series, filename: pd.Series) -> pd.Series:
        # suffix-aware like the reference executor (tempfile suffix)
        return pd.Series(
            [
                bytes(b)[5:].decode("utf-8")
                for b in content
            ],
            index=content.index,
        )

    docs = files.select(
        "path",
        "filename",
        to_markdown(F.col("content"), F.col("filename")).alias("markdown"),
    )

    def _identity_llm(texts: pd.Series, schema: dict) -> pd.Series:
        return texts.astype("object")

    info = extract_by_llm(
        docs,
        _PATIENT_T,
        llm_fn=_identity_llm,
        instruction="Please extract patient information from the intake form.",
        id_col="path",
        text_col="markdown",
    ).join(docs.select("path", "filename"), "path")

    flow = Flow("PatientIntakeExtraction")
    flow.add_source("documents", files, key_cols=["path"])
    flow._add_to_collector(
        "patients_index",
        info.select("filename", F.col("extracted").alias("patient_info")),
    )
    flow.export("patients_index", "patients_info", primary_key=["filename"])

    got = {
        r["filename"]: r["patient_info"]
        for r in flow.collector("patients_index").collect()
    }
    a = got["form_a.docx"]
    assert a["name"] == "Jordan Smith"
    assert str(a["dob"]) == "1984-03-12"
    assert a["address"]["zip_code"] == "62701"
    assert a["insurance"]["group_number"] is None
    assert a["past_conditions"][0]["diagnosed"] is True
    assert [x["name"] for x in a["allergies"]] == ["penicillin", "dust"]
    assert a["pharmacy"]["address"]["city"] == "Springfield"
    assert str(a["consent_date"]) == "2024-05-01"
    b = got["form_b.pdf"]
    assert b["insurance"] is None
    assert b["surgeries"][0]["name"] == "appendectomy"
    assert b["occupation"] is None
    assert b["consent_given"] is False
    assert b["consent_date"] is None


# ---------------------------------------------------------- multi-format


def test_multi_format_indexing_example_flow(spark, tmp_path):
    src = tmp_path / "source_files"
    src.mkdir()
    # fake pdf: pages separated by PAGEBREAK; images are raw bytes
    (src / "report.pdf").write_bytes(
        b"page-one-pixels\nPAGEBREAK\npage-two-pixels\nPAGEBREAK\npage-three"
    )
    (src / "photo.png").write_bytes(b"\x89PNG-fake-photo-bytes")
    (src / "notes.txt").write_bytes(b"plain text, not indexable")

    files = read_local_files(spark, str(src), binary=True)

    # file_to_pages (main.py:23-43): MIME dispatch via the filename —
    # pdf → one row per page, image/* → single page (page NULL),
    # else no rows. LTable semantics = explode.
    @F.pandas_udf("array<struct<page_number: int, image: binary>>")
    def file_to_pages(filename: pd.Series, content: pd.Series) -> pd.Series:
        import mimetypes

        out = []
        for fn, b in zip(filename, content):
            mt, _ = mimetypes.guess_type(fn)
            if mt == "application/pdf":
                pages = bytes(b).split(b"PAGEBREAK\n")
                out.append(
                    [
                        {"page_number": i + 1, "image": p}
                        for i, p in enumerate(pages)
                    ]
                )
            elif mt and mt.startswith("image/"):
                out.append([{"page_number": None, "image": bytes(b)}])
            else:
                out.append([])
        return pd.Series(out, dtype="object")

    pages = files.select(
        "filename",
        F.explode(
            file_to_pages(F.col("filename"), F.col("content"))
        ).alias("p"),
    ).select("filename", "p.page_number", "p.image")

    # ColPali multi-vector embed double (ColPaliEmbedImage stand-in):
    # the double is token-per-vector, so feed 4 base64 slices of the
    # page image as 'patches' -> 4 vectors of dim 8
    b64 = F.base64(F.col("image"))
    patches = F.concat_ws(
        " ",
        F.substring(b64, 1, 6), F.substring(b64, 7, 6),
        F.substring(b64, 13, 6), F.substring(b64, 19, 6),
    )
    embedded = pages.withColumn(
        "embedding", multi_vector_hash_embedder(dim=8)(patches)
    )

    flow = Flow("MultiFormatIndexing")
    s = flow.add_source(
        "pages", embedded, key_cols=["filename", "page_number"]
    )
    s.collect(
        "multi_format_indexings",
        {
            "filename": "filename",
            "page": "page_number",
            "embedding": "embedding",
        },
        auto_uuid_field="id",
    )
    out = flow.collector("multi_format_indexings")
    rows = out.collect()
    per_file = {}
    for r in rows:
        per_file.setdefault(r["filename"], []).append(r)
    assert len(per_file["report.pdf"]) == 3
    assert sorted(r["page"] for r in per_file["report.pdf"]) == [1, 2, 3]
    assert len(per_file["photo.png"]) == 1
    assert per_file["photo.png"][0]["page"] is None
    assert "notes.txt" not in per_file
    for r in rows:
        assert 1 <= len(r["embedding"]) <= 4 and len(r["embedding"][0]) == 8

    # multi-vector collection: TableSink MERGE semantics (the named
    # multi-vector config is Qdrant-side metadata)
    from cocoindex_data_ingestion_spark.sinks import TableSink

    sink = TableSink(
        spark,
        str(tmp_path / "qdrant_multi"),
        key_cols=["id"],
        schema_ddl=(
            "id string, filename string, page int, "
            "embedding array<array<float>>"
        ),
    )
    merged = out.select(
        "id", "filename", "page",
        F.col("embedding").cast("array<array<float>>"),
    )
    sink.merge(merged)
    sink.merge(merged)
    assert sink.read().count() == 4


# ---------------------------------------------------------- pdf embedding


def test_pdf_embedding_example_flow(spark, tmp_path):
    src = tmp_path / "pdf_files"
    src.mkdir()
    md_a = (
        "# Spark internals\n\nCatalyst rewrites plans; Tungsten "
        "generates code.\n\n## Shuffle\n\nExchanges hash-partition "
        "rows between stages.\n"
    )
    md_b = "# Tiny doc\n\nOne short paragraph only.\n"
    (src / "internals.pdf").write_bytes(_fake_pdf(md_a))
    (src / "tiny.pdf").write_bytes(_fake_pdf(md_b))

    files = read_local_files(spark, str(src), binary=True)
    docs = files.select(
        "path", "filename",
        _pdf_to_markdown_col()(F.col("content")).alias("markdown"),
    )
    chunks = chunking.chunk_recursive_dp(
        docs,
        chunk_size=2000,
        chunk_overlap=500,
        language="markdown",
        id_col="path",
        text_col="markdown",
    )
    # shared text_to_embedding transform-flow (hash double for the
    # SentenceTransformer)
    embedded = chunks.join(docs.select("path", "filename"), "path").select(
        "filename",
        F.col("location_start").alias("location"),
        F.col("chunk_text").alias("text"),
        hash_embedder(DIM)(F.col("chunk_text")).alias("embedding"),
    )
    flow = Flow("PdfEmbedding")
    s = flow.add_source(
        "chunks", embedded, key_cols=["filename", "location"]
    )
    s.collect(
        "pdf_embeddings",
        {
            "filename": "filename",
            "location": "location",
            "text": "text",
            "embedding": "embedding",
        },
        auto_uuid_field="id",
    )
    out = flow.collector("pdf_embeddings")

    sink = VectorSink(
        spark,
        str(tmp_path / "pdf_embeddings"),
        key_cols=["id"],
        schema_ddl=(
            "id string, filename string, location long, text string, "
            "embedding array<float>"
        ),
        vector_cols={"embedding": DIM},
    )
    sink.merge(
        out.select(
            "id", "filename", "location", "text",
            F.col("embedding").cast("array<float>"),
        )
    )

    # search() (main.py:100-123): embed the query with the SAME
    # transform flow, cosine top-k over the exported table
    qvec = hash_embed_series(pd.Series(["how do exchanges work"]), DIM)[0]
    stored = sink.read()
    q = F.array(*[F.lit(float(x)) for x in qvec])
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    res = (
        stored.select(
            "filename", "text", dot.alias("score")
        )
        .orderBy(F.desc("score"), "filename")
        .limit(5)
        .collect()
    )
    assert len(res) >= 1
    assert res[0]["filename"] in {"internals.pdf", "tiny.pdf"}
    # determinism: same query twice → identical result
    res2 = (
        stored.select("filename", "text", dot.alias("score"))
        .orderBy(F.desc("score"), "filename")
        .limit(5)
        .collect()
    )
    assert res == res2


# ------------------------------------------------------ qdrant embedding


def test_text_embedding_qdrant_example_flow(spark, tmp_path):
    src = tmp_path / "markdown_files"
    src.mkdir()
    (src / "a.md").write_text(
        "# Watermarks\n\nEvent-time progress markers bound state.\n"
    )
    (src / "b.md").write_text(
        "# Broadcast\n\nSmall sides ship to every executor.\n"
    )

    files = read_local_files(spark, str(src), include_glob="*.md", binary=False)
    docs = files.select(
        "path", "filename", F.col("content_text").alias("text")
    )
    chunks = chunking.chunk_recursive_dp(
        docs,
        chunk_size=2000,
        chunk_overlap=500,
        language="markdown",
        id_col="path",
        text_col="text",
    )
    embedded = chunks.join(docs.select("path", "filename"), "path").select(
        "filename",
        F.col("location_start").alias("location"),
        F.col("chunk_text").alias("text"),
        hash_embedder(DIM)(F.col("chunk_text")).alias("text_embedding"),
    )
    flow = Flow("TextEmbeddingWithQdrant")
    s = flow.add_source(
        "chunks", embedded, key_cols=["filename", "location"]
    )
    s.collect(
        "doc_embeddings",
        {
            "filename": "filename",
            "location": "location",
            "text": "text",
            "text_embedding": "text_embedding",  # the NAMED vector
        },
        auto_uuid_field="id",
    )
    out = flow.collector("doc_embeddings")
    sink = VectorSink(
        spark,
        str(tmp_path / "qdrant_text"),
        key_cols=["id"],
        schema_ddl=(
            "id string, filename string, location long, text string, "
            "text_embedding array<float>"
        ),
        vector_cols={"text_embedding": DIM},
    )
    sink.merge(
        out.select(
            "id", "filename", "location", "text",
            F.col("text_embedding").cast("array<float>"),
        )
    )

    # query loop body: embed query, search the named vector, return
    # (score, payload) pairs
    qvec = hash_embed_series(pd.Series(["broadcast join"]), DIM)[0]
    q = F.array(*[F.lit(float(x)) for x in qvec])
    dot = F.aggregate(
        F.zip_with(F.col("text_embedding"), q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    hits = (
        sink.read()
        .select("filename", "text", dot.alias("score"))
        .orderBy(F.desc("score"), "filename")
        .limit(10)
        .collect()
    )
    assert len(hits) == 2
    assert {h["filename"] for h in hits} == {"a.md", "b.md"}


# ---------------------------------------------------------- faces


def test_face_recognition_example_flow(spark, tmp_path):
    src = tmp_path / "images"
    src.mkdir()
    (src / "group.png").write_bytes(b"\x89PNG-three-people-here-xyz")
    (src / "solo.jpg").write_bytes(b"\xff\xd8JPEG-one-person-abc")
    (src / "empty.png").write_bytes(b"\x89PNG-landscape-no-faces")

    files = read_local_files(spark, str(src), binary=True)

    # extract_faces double (face_recognition stand-in, main.py:34-76):
    # deterministic per-bytes face count + rect grid; crop = byte
    # slice (LTable semantics preserved: list[FaceBase])
    @F.pandas_udf(
        "array<struct<rect: struct<min_x: int, min_y: int, max_x: int, "
        "max_y: int>, image: binary>>"
    )
    def extract_faces(content: pd.Series) -> pd.Series:
        out = []
        for b in content:
            b = bytes(b)
            if b"no-faces" in b:
                out.append([])
                continue
            n = 3 if b"three" in b else 1
            faces = []
            for i in range(n):
                rect = {
                    "min_x": 10 * i,
                    "min_y": 20 * i,
                    "max_x": 10 * i + 8,
                    "max_y": 20 * i + 8,
                }
                faces.append(
                    {"rect": rect, "image": b[i: i + 8]}
                )
            out.append(faces)
        return pd.Series(out, dtype="object")

    faces = files.select(
        "filename",
        F.explode(extract_faces(F.col("content"))).alias("f"),
    ).select("filename", "f.rect", "f.image")

    embedded = faces.withColumn(
        "embedding", hash_embedder(DIM)(F.base64(F.col("image")))
    )

    flow = Flow("FaceRecognition")
    s = flow.add_source(
        "faces", embedded,
        key_cols=["filename", "rect"],
    )
    s.collect(
        "face_embeddings",
        {
            "filename": "filename",
            "rect": "rect",
            "embedding": "embedding",
        },
        auto_uuid_field="id",
    )
    out = flow.collector("face_embeddings")
    rows = out.collect()
    per_file = {}
    for r in rows:
        per_file.setdefault(r["filename"], []).append(r)
    assert len(per_file["group.png"]) == 3
    assert len(per_file["solo.jpg"]) == 1
    assert "empty.png" not in per_file
    rects = sorted(
        (r["rect"]["min_x"], r["rect"]["min_y"])
        for r in per_file["group.png"]
    )
    assert rects == [(0, 0), (10, 20), (20, 40)]
    assert len({r["id"] for r in rows}) == 4

    sink = VectorSink(
        spark,
        str(tmp_path / "face_embeddings"),
        key_cols=["id"],
        schema_ddl=(
            "id string, filename string, "
            "rect struct<min_x: int, min_y: int, max_x: int, max_y: int>, "
            "embedding array<float>"
        ),
        vector_cols={"embedding": DIM},
    )
    merged = out.select(
        "id", "filename", "rect", F.col("embedding").cast("array<float>")
    )
    sink.merge(merged)
    sink.merge(merged)
    assert sink.read().count() == 4
    # same face bytes → same embedding (op cache=True contract)
    again = {
        r["id"]: [round(float(x), 5) for x in r["embedding"]]
        for r in out.collect()
    }
    stored = {
        r["id"]: [round(float(x), 5) for x in r["embedding"]]
        for r in sink.read().collect()
    }
    assert again == stored

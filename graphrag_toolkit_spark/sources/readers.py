"""Document readers and staged-docs persistence (SURVEY §2.1 S1-S2).

Parity targets:
- S1 reader providers (18 modules under ``indexing/load/readers/providers/``):
  each parsed a source format into ``Document`` rows. Here every structured
  format is one ``spark.read`` call producing the canonical document schema
  ``(doc_id, text, metadata map<string,string>)``; binary formats (pdf, docx,
  pptx) are a ``binaryFile`` scan + a parse stub (codec libraries are not in
  this container — the mapInPandas plumbing is the production shape, see
  ``operators/multimodal.py`` for the pattern).
- S2 FileBasedDocs/S3BasedDocs (``indexing/load/file_based_docs.py``,
  ``s3_based_docs.py``): JSONL staging between extract and build →
  ``write_staged`` / ``read_staged`` (a checkpointed stage boundary; on a
  cluster the path is S3/HDFS and partitioning carries over).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphrag_toolkit_spark import ids

DOC_SCHEMA = "doc_id string, text string, metadata map<string,string>"


def _canonical(df: DataFrame, text_col: str, meta_cols: list[str]) -> DataFrame:
    """Project any tabular source to the canonical document frame, minting
    content-addressed ids (re-ingestion idempotent, §1.4)."""
    meta = F.map_from_arrays(
        F.array(*[F.lit(c) for c in meta_cols]),
        F.array(*[F.col(c).cast("string") for c in meta_cols]),
    )
    meta_str = F.to_json(meta)
    return df.select(
        ids.source_id(F.col(text_col), meta_str).alias("doc_id"),
        F.col(text_col).alias("text"),
        meta.alias("metadata"),
    )


def read_jsonl(
    spark: SparkSession, path: str, text_field: str = "text",
    meta_fields: list[str] | None = None,
) -> DataFrame:
    """JSONL / streaming-JSONL reader (S1): one JSON object per line.
    ``spark.read.json`` splits files line-wise and parallelizes across the
    cluster — the reference's 313-LoC incremental reader collapses into the
    source's own batching."""
    raw = spark.read.json(path)
    meta_fields = meta_fields or [c for c in raw.columns if c != text_field]
    return _canonical(raw, text_field, meta_fields)


def read_csv_docs(
    spark: SparkSession, path: str, text_field: str = "text",
    meta_fields: list[str] | None = None,
) -> DataFrame:
    raw = spark.read.csv(path, header=True)
    meta_fields = meta_fields or [c for c in raw.columns if c != text_field]
    return _canonical(raw, text_field, meta_fields)


def read_text_directory(spark: SparkSession, path: str) -> DataFrame:
    """Directory reader (S1 directory/universal-directory): whole files as
    documents, file path as metadata."""
    raw = spark.read.format("text").option("wholetext", True).load(path).select(
        F.col("value").alias("text"),
        F.input_file_name().alias("path"),
    )
    return _canonical(raw, "text", ["path"])


def read_binary_documents(spark: SparkSession, path: str, fmt_glob: str = "*") -> DataFrame:
    """Binary-format reader shell (pdf/docx/pptx/image providers): a
    ``binaryFile`` scan carrying (path, length, content-bytes). Parsing is a
    downstream mapInPandas stage; wire ``operators.multimodal.decode_media``
    or a real parser UDF onto the ``content`` column."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", fmt_glob)
        .load(path)
        .select(
            F.col("path"),
            F.col("length").alias("byte_len"),
            F.col("content"),
        )
    )


# --- OOXML parsers (docx/pptx) — stdlib zipfile+ElementTree, no codec libs --

_DOCX_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_PPTX_NS = "{http://schemas.openxmlformats.org/drawingml/2006/main}"


def _docx_text(content: bytes) -> str:
    """Paragraph text from word/document.xml — every ``w:t`` run inside a
    ``w:p``, runs concatenated, paragraphs newline-joined (the same text
    python-docx's paragraph walk produces for the reference's DocxReader,
    docx_reader_provider.py:40-44)."""
    import io
    import zipfile
    from xml.etree import ElementTree

    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        root = ElementTree.fromstring(zf.read("word/document.xml"))
    paras = []
    for p in root.iter(f"{_DOCX_NS}p"):
        runs = [t.text or "" for t in p.iter(f"{_DOCX_NS}t")]
        if runs:
            paras.append("".join(runs))
    return "\n".join(paras)


def _pptx_text(content: bytes) -> str:
    """Slide text from ppt/slides/slide*.xml in slide order — every ``a:t``
    text run, runs within a slide newline-joined, slides double-newline-
    joined (pptx_reader_provider.py's PptxReader surface)."""
    import io
    import re as _re
    import zipfile
    from xml.etree import ElementTree

    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        slides = sorted(
            (n for n in zf.namelist()
             if _re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
            key=lambda n: int(_re.search(r"(\d+)", n).group(1)),
        )
        texts = []
        for name in slides:
            root = ElementTree.fromstring(zf.read(name))
            runs = [t.text or "" for t in root.iter(f"{_PPTX_NS}t")]
            if runs:
                texts.append("\n".join(runs))
    return "\n\n".join(texts)


def _parsed_binary_reader(parse_fn, fmt_glob: str):
    """binaryFile scan → Arrow-batched ``parse_fn(bytes) -> str`` via
    mapInPandas → canonical document frame. The scan distributes files
    across executors; each parse is per-file CPU work with no shuffle.
    Shared shell for every bytes-to-text format (docx, pptx, html, pdf)."""
    def _reader(spark: SparkSession, path: str, **kwargs) -> DataFrame:
        import pandas as pd

        raw = read_binary_documents(spark, path, fmt_glob=fmt_glob)

        def parse(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "path": pdf["path"],
                        "text": [parse_fn(bytes(b)) for b in pdf["content"]],
                    }
                )

        parsed = raw.mapInPandas(parse, schema="path string, text string")
        return _canonical(parsed, "text", ["path"])

    return _reader


read_docx = _parsed_binary_reader(_docx_text, "*.docx")
read_pptx = _parsed_binary_reader(_pptx_text, "*.pptx")


# --- HTML parser (web provider) — stdlib html.parser, no external lib -------

_HTML_SKIP = frozenset({"script", "style", "noscript", "template"})
_HTML_BLOCK = frozenset({
    "address", "article", "aside", "blockquote", "br", "caption", "dd",
    "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer", "form",
    "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "li", "main", "nav",
    "ol", "option", "p", "pre", "section", "select", "table", "tbody", "td",
    "tfoot", "th", "thead", "title", "tr", "ul",
})


def _html_text(content: bytes) -> str:
    """Visible text from an HTML page (the reference's WebReaderProvider —
    web_reader_provider.py — fetches URLs then strips markup to text; the
    fetch is the caller's concern here, the strip is this function):
    script/style/noscript/template subtrees dropped, block-element
    boundaries become newlines, inline runs concatenated, character/entity
    references decoded (``convert_charrefs``), whitespace inside a block
    collapsed to single spaces. stdlib ``html.parser`` is tolerant of
    unclosed tags and attribute soup, so real-world pages parse."""
    from html.parser import HTMLParser

    class _Extract(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self._skip = 0
            self._parts: list[str] = []
            self.blocks: list[str] = []

        def flush(self) -> None:
            text = " ".join("".join(self._parts).split())
            self._parts = []
            if text:
                self.blocks.append(text)

        def handle_starttag(self, tag, attrs) -> None:
            if tag in _HTML_SKIP:
                self._skip += 1
            elif tag in _HTML_BLOCK:
                self.flush()

        def handle_endtag(self, tag) -> None:
            if tag in _HTML_SKIP:
                self._skip = max(0, self._skip - 1)
            elif tag in _HTML_BLOCK:
                self.flush()

        def handle_data(self, data) -> None:
            if not self._skip:
                self._parts.append(data)

    parser = _Extract()
    parser.feed(content.decode("utf-8", errors="replace"))
    parser.close()
    parser.flush()
    return "\n".join(parser.blocks)


read_html = _parsed_binary_reader(_html_text, "*.htm*")


# --- minimal PDF text extraction (pdf provider) — stdlib zlib only ----------

_PDF_STRING_ESCAPES = {
    ord("n"): 0x0A, ord("r"): 0x0D, ord("t"): 0x09, ord("b"): 0x08,
    ord("f"): 0x0C, ord("("): 0x28, ord(")"): 0x29, ord("\\"): 0x5C,
}


def _pdf_unescape(raw: bytes) -> str:
    """PDF literal-string unescape (ISO 32000-1 §7.3.4.2): named escapes,
    1-3 digit octal codes, backslash-newline continuation; everything else
    passes through. Bytes decode as Latin-1 (supersets PDFDocEncoding's
    ASCII range — the regime simple text streams use)."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c == 0x5C and i + 1 < n:  # backslash
            nxt = raw[i + 1]
            if nxt in _PDF_STRING_ESCAPES:
                out.append(_PDF_STRING_ESCAPES[nxt])
                i += 2
            elif 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                j, val = i + 1, 0
                while j < n and j < i + 4 and 0x30 <= raw[j] <= 0x37:
                    val = val * 8 + (raw[j] - 0x30)
                    j += 1
                out.append(val & 0xFF)
                i = j
            elif nxt in (0x0A, 0x0D):  # line continuation
                i += 2
                if nxt == 0x0D and i < n and raw[i] == 0x0A:
                    i += 1
            else:
                out.append(nxt)
                i += 2
        else:
            out.append(c)
            i += 1
    if out.startswith(b"\xfe\xff"):
        return out[2:].decode("utf-16-be", errors="replace")
    return out.decode("latin-1")


# content-stream tokens we care about: literal strings, hex strings,
# array brackets, and bare operator names
import re as _re  # noqa: E402  (module-level, used by the parsers below)

_PDF_TOKEN = _re.compile(
    rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|\[|\]|[A-Za-z'\"*]+"
)
_PDF_STREAM = _re.compile(rb"stream\r?\n(.*?)endstream", _re.DOTALL)
_PDF_BT = _re.compile(rb"\bBT\b(.*?)\bET\b", _re.DOTALL)
_NEWLINE_OPS = (b"Td", b"TD", b"T*", b"Tm")


def _pdf_text(content: bytes) -> str:
    """Minimal PDF text extraction, stdlib-only (the reference wraps pypdf
    — pdf_reader_provider.py — which is absent here): every ``stream`` body
    is FlateDecode-inflated (zlib) or taken raw, text objects (``BT``/``ET``)
    are scanned, and the show-text operators ``Tj`` ``'`` ``"`` ``TJ``
    contribute their literal/hex string operands; line-positioning
    operators (``Td`` ``TD`` ``T*`` ``Tm`` ``'`` ``"``) start a new output
    line. Covers the simple unencrypted PDFs this regime produces (single
    content stream per page, standard encodings).

    HONEST LIMIT: encrypted PDFs, cross-reference/object streams
    (``/ObjStm``), and CID/Type0 composite fonts need a full parser —
    when NO text object is found anywhere, this raises
    ``NotImplementedError`` rather than silently returning '' (the
    ``advanced-pdf`` provider stays a stub for exactly these)."""
    import zlib

    lines: list[str] = []
    found_text_object = False
    for m in _PDF_STREAM.finditer(content):
        body = m.group(1)
        try:
            data = zlib.decompress(body)
        except zlib.error:
            data = body
        for bt in _PDF_BT.finditer(data):
            found_text_object = True
            cur: list[str] = []
            pending: list[str] = []

            def flush() -> None:
                text = "".join(cur).strip()
                if text:
                    lines.append(text)
                cur.clear()

            for tok_m in _PDF_TOKEN.finditer(bt.group(1)):
                tok = tok_m.group(0)
                if tok.startswith(b"("):
                    pending.append(_pdf_unescape(tok[1:-1]))
                elif tok.startswith(b"<"):
                    hx = b"".join(tok[1:-1].split())
                    if len(hx) % 2:
                        hx += b"0"
                    pending.append(bytes.fromhex(hx.decode("ascii")).decode("latin-1"))
                elif tok in (b"Tj", b"TJ"):
                    cur.extend(pending)
                    pending.clear()
                elif tok in (b"'", b'"'):
                    flush()
                    cur.extend(pending)
                    pending.clear()
                elif tok in _NEWLINE_OPS:
                    flush()
                    pending.clear()
                elif tok in (b"[", b"]"):
                    continue
                else:
                    pending.clear()  # operand strings consumed by a non-show op
            flush()
    if not found_text_object:
        raise NotImplementedError(
            "pdf: no text object found in any content stream — encrypted, "
            "object-stream, or image-only PDF; needs a full parser "
            "(reference: advanced_pdf_reader_provider.py)"
        )
    return "\n".join(lines)


read_pdf = _parsed_binary_reader(_pdf_text, "*.pdf")


# --- database reader (S1 "database" provider, REAL via stdlib sqlite3) -------

_SQLITE_TYPE_MAP = {int: "long", float: "double", str: "string", bytes: "binary"}


def read_database(
    spark: SparkSession,
    db_path: str,
    query: str,
    partition_col: str | None = None,
    num_partitions: int = 8,
    text_field: str = "text",
    meta_fields: list[str] | None = None,
) -> DataFrame:
    """S1 database reader — REAL, distributed, zero external deps for
    sqlite (stdlib ``sqlite3``): the reference's provider runs one SQL
    query through SQLAlchemy/LlamaIndex and materializes every row in one
    process (``providers/database_reader_provider.py:45-64``); here the
    query is executed as JDBC-STYLE PARTITIONED RANGE READS — the exact
    contract of ``spark.read.jdbc(column, lowerBound, upperBound,
    numPartitions)``, which this engine uses unchanged once a driver jar
    is present for server databases.

    Mechanics: one driver-side connection infers the result schema
    (LIMIT 1) and the partition column's min/max; each of
    ``num_partitions`` tasks opens its OWN connection inside
    ``mapInPandas`` and runs the range-predicated query
    (``WHERE col >= lo AND col < hi``; the last range is unbounded above,
    so the ranges tile exactly). ``partition_col=None`` degrades to one
    task (the reference's behavior). The db file must be on storage every
    executor can reach — the same requirement JDBC puts on the server.

    Returns the canonical document frame (content-addressed doc_id, text,
    metadata) like every other S1 provider."""
    import sqlite3

    import pandas as pd

    sub = f"({query}) __q"
    with sqlite3.connect(db_path) as con:
        cur = con.execute(f"SELECT * FROM {sub} LIMIT 1")
        cols = [d[0] for d in cur.description]
        row = cur.fetchone()
        types = {
            c: _SQLITE_TYPE_MAP.get(type(v), "string")
            for c, v in zip(cols, row or [None] * len(cols))
        }
        if partition_col is not None:
            lo, hi = con.execute(
                f"SELECT MIN({partition_col}), MAX({partition_col}) FROM {sub}"
            ).fetchone()
        else:
            lo = hi = None
    if text_field not in cols:
        raise ValueError(f"query result has no {text_field!r} column: {cols}")
    schema = ", ".join(f"`{c}` {types[c]}" for c in cols)

    if partition_col is None or lo is None or lo == hi:
        bounds = [(None, None)]
    else:
        step = max(1, (int(hi) - int(lo) + num_partitions) // num_partitions)
        bounds = [
            (int(lo) + i * step,
             None if i == num_partitions - 1 else int(lo) + (i + 1) * step)
            for i in range(num_partitions)
        ]
        bounds = [(a, b) for a, b in bounds if b is None or a < b]
    spec = spark.createDataFrame(
        [(a, b) for a, b in bounds], "lo long, hi long"
    ).repartition(len(bounds))

    def fetch(batches):
        for pdf in batches:
            for a, b in zip(pdf["lo"], pdf["hi"]):
                con = sqlite3.connect(db_path)
                try:
                    if pd.isna(a):
                        q, args = f"SELECT * FROM {sub}", ()
                    elif pd.isna(b):
                        q, args = (
                            f"SELECT * FROM {sub} WHERE {partition_col} >= ?",
                            (int(a),),
                        )
                    else:
                        q, args = (
                            f"SELECT * FROM {sub} WHERE {partition_col} >= ? "
                            f"AND {partition_col} < ?",
                            (int(a), int(b)),
                        )
                    rows = con.execute(q, args).fetchall()
                finally:
                    con.close()
                yield pd.DataFrame(rows, columns=cols)

    raw = spec.mapInPandas(fetch, schema=schema)
    meta_fields = meta_fields or [c for c in cols if c != text_field]
    return _canonical(raw, text_field, meta_fields)


# --- provider registry (API-surface parity with the reference's 18 readers) --

def _needs_parser(fmt: str):
    def _stub(spark: SparkSession, path: str, **kwargs):
        raise NotImplementedError(
            f"{fmt} parsing needs a codec library not present in this "
            f"environment; scan with read_binary_documents(spark, path) and "
            f"attach a parser via mapInPandas (see operators/multimodal.py "
            f"for the stage shape)"
        )
    _stub.is_stub = True
    _stub.stub_reason = fmt
    return _stub


# reference provider name (indexing/load/readers/providers/) → reader
PROVIDERS = {
    "json": read_jsonl,
    "streaming-jsonl": read_jsonl,
    "csv": read_csv_docs,
    "structured-data": read_csv_docs,
    "markdown": read_text_directory,
    "directory": read_text_directory,
    "s3-directory": read_text_directory,      # same call; path is s3a:// on a cluster
    "universal-directory": read_text_directory,
    "document-graph": read_jsonl,             # staged docs are JSONL batches
    "database": read_database,                # REAL for sqlite (stdlib); server DBs
                                              # go through spark.read.jdbc with the
                                              # same partition-range contract
    "pdf": read_pdf,                          # stdlib zlib+text-operator scan; raises on
                                              # encrypted/objstm/image-only PDFs
    "advanced-pdf": _needs_parser("pdf-layout"),  # layout-aware parse (tables, reading
                                                  # order) genuinely needs a layout model
    "docx": read_docx,                        # stdlib ZIP+XML parse, no codec lib
    "pptx": read_pptx,                        # stdlib ZIP+XML parse, no codec lib
    "web": read_html,                         # stdlib html.parser visible-text strip
                                              # (URL fetch is the caller's transport)
    "wikipedia": _needs_parser("wikipedia-api"),
    "youtube": _needs_parser("youtube-transcript"),
    "github": _needs_parser("github-api"),
}


def is_stub(provider: str) -> bool:
    """True when the provider's parse step raises NotImplementedError in
    this environment (missing codec/service library) — the Spark-side scan
    plumbing still exists via ``read_binary_documents``."""
    return bool(getattr(PROVIDERS[provider], "is_stub", False))


def provider_status() -> dict[str, str]:
    """Honest registry: provider name → 'real' | 'stub (<missing dep>)'.
    Importable by docs/tests so the matrix can't silently drift."""
    return {
        name: (
            f"stub ({fn.stub_reason})" if getattr(fn, "is_stub", False) else "real"
        )
        for name, fn in sorted(PROVIDERS.items())
    }


def reader_for(provider: str, allow_stub: bool = True):
    """Look up a reader by the reference's provider name (S1 parity surface).
    ``allow_stub=False`` raises immediately at lookup time (rather than call
    time) for providers whose parser is stubbed in this environment."""
    try:
        fn = PROVIDERS[provider]
    except KeyError:
        raise ValueError(
            f"unknown provider {provider!r}; available: {sorted(PROVIDERS)}"
        ) from None
    if not allow_stub and getattr(fn, "is_stub", False):
        raise NotImplementedError(
            f"provider {provider!r} is a parse stub in this environment "
            f"(missing: {fn.stub_reason})"
        )
    return fn


def write_staged(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """S2: persist extracted docs as JSONL (stage boundary / checkpoint)."""
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").json(path)


def read_staged(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.json(path)

"""Sinks: N-Triples (default) and RDF/XML serialization of the triples
dataset.

The default replaces the reference's RDF/XML writer
(`components/RDFCodeGenerator.php:116-154`) — whose emitted XML is
malformed (unclosed tags; see SURVEY.md §3.3) — with standards-valid
N-Triples lines, written as sharded text files. Literal objects are
escaped per the N-Triples grammar; entity objects are IRIs.

``write_rdfxml`` is the surface-parity export (CLI ``--format
rdfxml``): it keeps the reference's document shape — the
``<?xml version="1.0"?>`` prolog, the ``<rdf:RDF>`` envelope with the
same namespace block (`RDFCodeGenerator.php:133-141`), one
``<owl:Thing rdf:about=...>`` element per subject occurrence
(`:55,74,95`) — but fixes its malformations: the mismatched
quote characters and duplicated ``xmlns:owl`` in the header, the
never-closed element tags, and the missing property children (the
reference opens a tag per annotation and writes neither predicate nor
object). Output is well-formed XML, one standalone document per shard
(mirroring the sharded ``.nt`` layout).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

_ESCAPES = {
    "\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t",
}


def _escape_literal(s: str) -> str:
    out = []
    for ch in s:
        out.append(_ESCAPES.get(ch, ch))
    return "".join(out)


def to_ntriples_lines(triples: rd.Dataset) -> rd.Dataset:
    """Dataset[(subj, pred, obj, obj_is_literal)] -> Dataset[line:str]."""
    def fmt(t: pa.Table) -> pa.Table:
        lines = []
        for s, p, o, lit in zip(t.column("subj").to_pylist(),
                                t.column("pred").to_pylist(),
                                t.column("obj").to_pylist(),
                                t.column("obj_is_literal").to_pylist()):
            obj = f'"{_escape_literal(o)}"' if lit else f"<{o}>"
            lines.append(f"<{s}> <{p}> {obj} .")
        return pa.table({"text": pa.array(lines, pa.string())})
    return triples.map_batches(fmt, batch_format="pyarrow")


def write_ntriples(triples: rd.Dataset, path: str) -> None:
    """Write sharded ``part-*.nt`` files (one N-Triples line per
    triple). This Ray version has no ``write_text`` sink, so each task
    writes its own shard file — same layout, same parallelism."""
    import os
    import uuid

    os.makedirs(path, exist_ok=True)
    lines = to_ntriples_lines(triples)

    def dump(t: pa.Table) -> pa.Table:
        if t.num_rows:
            name = os.path.join(path, f"part-{uuid.uuid4().hex[:12]}.nt")
            tmp = name + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write("\n".join(t.column("text").to_pylist()))
                f.write("\n")
            os.rename(tmp, name)
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    # consume: one shard file per block
    lines.map_batches(dump, batch_size=None, batch_format="pyarrow").count()


# ---------------------------------------------------------------------------
# N-Triples SOURCE (round-trips the sink above; tolerant of the wider
# grammar: typed literals, language tags, comments, blank lines)
# ---------------------------------------------------------------------------

# one triple line: <iri> <iri> (<iri> | "literal"[@lang | ^^<dtype>]) .
_NT_LINE = None          # compiled lazily (module import stays cheap)
_NT_UNESC = None


def _nt_patterns():
    global _NT_LINE, _NT_UNESC
    if _NT_LINE is None:
        import re
        _NT_LINE = re.compile(
            r'^<([^>]*)>\s+<([^>]*)>\s+'
            r'(?:<([^>]*)>'                          # IRI object
            r'|"((?:[^"\\]|\\.)*)"'                  # literal body
            r'(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?'   # lang / datatype
            r')\s*\.\s*$')
        _NT_UNESC = re.compile(
            r'\\(?:u([0-9A-Fa-f]{4})|U([0-9A-Fa-f]{8})|(.))')
    return _NT_LINE, _NT_UNESC


_NT_SIMPLE = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t",
              "b": "\b", "f": "\f", "'": "'"}


def _nt_unescape(s: str) -> str:
    _, unesc = _nt_patterns()

    def sub(m):
        u4, u8, ch = m.groups()
        if u4 is not None:
            return chr(int(u4, 16))
        if u8 is not None:
            return chr(int(u8, 16))
        if ch in _NT_SIMPLE:
            return _NT_SIMPLE[ch]
        raise ValueError(f"invalid N-Triples escape \\{ch}")
    return unesc.sub(sub, s)


_NT_SCHEMA = pa.schema([
    ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
    ("obj_is_literal", pa.bool_()), ("obj_lang", pa.string()),
    ("obj_datatype", pa.string())])


def parse_ntriples_lines(lines: rd.Dataset, text_col: str = "text",
                         strict: bool = True) -> rd.Dataset:
    """Dataset[line:str] -> Dataset[(subj, pred, obj, obj_is_literal,
    obj_lang, obj_datatype)] — the inverse of
    :func:`to_ntriples_lines`, accepting the wider N-Triples grammar
    (language tags, ``^^<datatype>`` literals, ``#`` comments, blank
    lines). ``strict=True`` raises on an unparseable line with the
    offending text; ``strict=False`` drops it. Parsing is inherently
    per-line (one compiled regex match per line inside the batch —
    the vectorizable work, split/filter, stays in Arrow)."""

    def parse(t: pa.Table) -> pa.Table:
        line_re, _ = _nt_patterns()
        subs, preds, objs, lits, langs, dts = [], [], [], [], [], []
        for raw in t.column(text_col).to_pylist():
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            m = line_re.match(line)
            if not m:
                if strict:
                    raise ValueError(f"unparseable N-Triples line: {raw!r}")
                continue
            s, p, o_iri, o_lit, lang, dtype = m.groups()
            subs.append(_nt_unescape(s))
            preds.append(_nt_unescape(p))
            if o_iri is not None:
                objs.append(_nt_unescape(o_iri))
                lits.append(False)
                langs.append(None)
                dts.append(None)
            else:
                objs.append(_nt_unescape(o_lit))
                lits.append(True)
                langs.append(lang)
                dts.append(_nt_unescape(dtype) if dtype else None)
        return pa.table({
            "subj": pa.array(subs, pa.string()),
            "pred": pa.array(preds, pa.string()),
            "obj": pa.array(objs, pa.string()),
            "obj_is_literal": pa.array(lits, pa.bool_()),
            "obj_lang": pa.array(langs, pa.string()),
            "obj_datatype": pa.array(dts, pa.string())})

    return lines.map_batches(parse, batch_format="pyarrow")


def read_ntriples(path: str, strict: bool = True) -> rd.Dataset:
    """Read sharded ``*.nt`` files back into a triples Dataset — the
    source the reference never had (its RDF output was terminal;
    `components/RDFCodeGenerator.php` only writes). One read task per
    file shard; parsing streams per batch."""
    return parse_ntriples_lines(rd.read_text(path), text_col="text",
                                strict=strict)


# ---------------------------------------------------------------------------
# RDF/XML (reference surface parity, malformations fixed)
# ---------------------------------------------------------------------------

_XML_TEXT_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;"}
_XML_ATTR_ESC = {**_XML_TEXT_ESC, '"': "&quot;"}


def _xml_escape(s: str, attr: bool = False) -> str:
    table = _XML_ATTR_ESC if attr else _XML_TEXT_ESC
    return "".join(table.get(ch, ch) for ch in s)


def _split_qname(uri: str) -> tuple[str, str]:
    """Split a predicate URI into (namespace, local name) at the last
    '#' or '/'. The local part must be a valid XML NCName start; our
    predicates (dbp:...) always are."""
    for sep in ("#", "/"):
        pos = uri.rfind(sep)
        if pos > 0 and pos < len(uri) - 1:
            return uri[: pos + 1], uri[pos + 1:]
    return "", uri


# \r\n line ends, tab indents and attribute layout follow the
# reference's content strings (RDFCodeGenerator.php:133-141) with the
# quote mismatch and the duplicated xmlns:owl removed.
_RDFXML_HEADER = (
    '<?xml version="1.0"?>\r\n'
    "<rdf:RDF\r\n"
    '\txmlns      = "{base}#"\r\n'
    '\txml:base   = "{base}#"\r\n'
    '\txmlns:owl  = "http://www.w3.org/2002/07/owl#"\r\n'
    '\txmlns:rdf  = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"\r\n'
    '\txmlns:rdfs = "http://www.w3.org/2000/01/rdf-schema#"\r\n'
    '\txmlns:xsd  = "http://www.w3.org/2001/XMLSchema#"\r\n'
    '\txmlns:ns1  = "{pred_ns}">\r\n'
    "\r\n"
)


def rdfxml_document(triples_tbl: pa.Table,
                    base: str = "http://example.org/tabbyray") -> str:
    """One complete RDF/XML document for a (subj, pred, obj,
    obj_is_literal) Arrow table. Deterministic in row order. All
    predicates must share one namespace (true for the engine's dbp:
    output); it is declared as ``ns1`` in the envelope."""
    subs = triples_tbl.column("subj").to_pylist()
    preds = triples_tbl.column("pred").to_pylist()
    objs = triples_tbl.column("obj").to_pylist()
    lits = triples_tbl.column("obj_is_literal").to_pylist()
    pred_ns = _split_qname(preds[0])[0] if preds else \
        "http://dbpedia.org/property/"
    parts = [_RDFXML_HEADER.format(base=base, pred_ns=pred_ns)]
    for s, p, o, lit in zip(subs, preds, objs, lits):
        ns, local = _split_qname(p)
        if ns != pred_ns:
            raise ValueError(
                f"predicate {p!r} outside declared namespace {pred_ns!r}")
        parts.append(f'\t<owl:Thing rdf:about="{_xml_escape(s, attr=True)}">\r\n')
        if lit:
            parts.append(
                f"\t\t<ns1:{local}>{_xml_escape(o)}</ns1:{local}>\r\n")
        else:
            parts.append(
                f'\t\t<ns1:{local} rdf:resource="{_xml_escape(o, attr=True)}"/>\r\n')
        parts.append("\t</owl:Thing>\r\n")
    parts.append("</rdf:RDF>")
    return "".join(parts)


def write_rdfxml(triples: rd.Dataset, path: str,
                 base: str = "http://example.org/tabbyray") -> None:
    """Write sharded ``part-*.rdf`` files — each shard a standalone
    well-formed RDF/XML document over its block's triples (same
    task-parallel layout as ``write_ntriples``)."""
    import os
    import uuid

    os.makedirs(path, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        if t.num_rows:
            name = os.path.join(path, f"part-{uuid.uuid4().hex[:12]}.rdf")
            tmp = name + ".tmp"
            with open(tmp, "w", encoding="utf-8", newline="") as f:
                f.write(rdfxml_document(t, base=base))
            os.rename(tmp, name)
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    triples.map_batches(dump, batch_size=None, batch_format="pyarrow").count()

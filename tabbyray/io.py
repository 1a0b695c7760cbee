"""Sinks: N-Triples serialization of the triples dataset.

Replaces the reference's RDF/XML writer
(`components/RDFCodeGenerator.php:116-154`) — whose emitted XML is
malformed (unclosed tags; see SURVEY.md §3.3) — with standards-valid
N-Triples lines, written as sharded text files. Literal objects are
escaped per the N-Triples grammar; entity objects are IRIs.
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

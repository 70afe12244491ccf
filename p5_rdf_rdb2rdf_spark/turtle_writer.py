"""Turtle serialization with namespace prefixes (SURVEY.md O6).

Reference parity: ``process_turtle`` serializes the model with the mapping's
prefixes via RDF::Trine's Turtle serializer. N-Triples (:mod:`.ntriples`)
remains the canonical comparison format; this writer produces the
human-facing prefixed form — driver-side, for result graphs small enough to
collect (mapping outputs in tests/debugging). For 100 TB graphs serialize
distributed N-Triples lines instead (``ntriples_lines`` writes straight from
executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .terms import KIND_BLANK, KIND_IRI


def _qname(iri: str, namespaces: dict[str, str]) -> str | None:
    for prefix, ns in namespaces.items():
        if iri.startswith(ns):
            local = iri[len(ns):]
            if local and all(c.isalnum() or c in "_-" for c in local):
                return f"{prefix}:{local}"
    return None


def _fmt_term(kind: str, value: str, datatype: str | None, lang: str | None, ns: dict[str, str]) -> str:
    if kind == KIND_IRI:
        q = _qname(value, ns)
        return q if q else f"<{value}>"
    if kind == KIND_BLANK:
        return f"_:{value}"
    esc = value.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    lit = f'"{esc}"'
    if lang:
        return f"{lit}@{lang}"
    if datatype:
        q = _qname(datatype, ns)
        return f"{lit}^^{q}" if q else f"{lit}^^<{datatype}>"
    return lit


def to_turtle(
    triples: DataFrame,
    namespaces: dict[str, str] | None = None,
    max_triples: int = 1_000_000,
) -> str:
    """Collect + pretty-print as Turtle, grouping by subject (driver-side).

    ``max_triples`` guards the collect: this writer is for mapping-document-
    scale graphs; pointing it at a billion-triple graph would OOM the driver.
    Raise the cap explicitly if you really mean it, or use the distributed
    ``ntriples_lines`` writer for big graphs."""
    ns = {"rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
          "xsd": "http://www.w3.org/2001/XMLSchema#"}
    ns.update(namespaces or {})
    rows = triples.limit(max_triples + 1).collect()
    if len(rows) > max_triples:
        raise ValueError(
            f"to_turtle: graph exceeds max_triples={max_triples}; use the "
            "distributed ntriples_lines writer (or raise max_triples)"
        )
    by_subject: dict[tuple[str, str], list] = {}
    for r in rows:
        by_subject.setdefault((r.s_kind, r.s_value), []).append(r)

    out = [f"@prefix {p}: <{iri}> ." for p, iri in sorted(ns.items())]
    out.append("")
    for (s_kind, s_value) in sorted(by_subject):
        subj = _fmt_term(s_kind, s_value, None, None, ns)
        lines = []
        group = sorted(
            by_subject[(s_kind, s_value)],
            key=lambda r: (r.p_value != "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", r.p_value, r.o_value),
        )
        for r in group:
            pred = (
                "a"
                if r.p_value == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
                else (_qname(r.p_value, ns) or f"<{r.p_value}>")
            )
            obj = _fmt_term(r.o_kind, r.o_value, r.o_datatype, r.o_lang, ns)
            lines.append(f"    {pred} {obj}")
        out.append(f"{subj}\n" + " ;\n".join(lines) + " .")
    return "\n".join(out) + "\n"

"""p5_rdf_rdb2rdf_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the CPAN
distribution RDF-RDB2RDF (tobyink/p5-rdf-rdb2rdf): W3C R2RML + Direct
Mapping processors, re-expressed as Catalyst-optimizable DataFrame plans.

Reference semantics (see SURVEY.md for anchors; /root/reference was empty at
survey time so anchors are of the form ``lib/RDF/RDB2RDF/<Module>.pm::<sub>``
plus W3C spec sections):

- ``RDF::RDB2RDF::Simple``   -> :mod:`.simple`   (hashref mapping language)
- ``RDF::RDB2RDF::R2RML``    -> :mod:`.r2rml`    (Turtle mapping graph)
- ``RDF::RDB2RDF::DirectMapping`` -> :mod:`.direct_mapping`
- ``RDF::RDB2RDF::DirectMapping::Store`` -> :mod:`.store`
- row loop + RDF::Trine emission -> :mod:`.compiler` (IR -> DataFrame plan)

Beyond the reference's construction surface (it hands query answering to
RDF::Trine), this engine also ships the query/validation/enrichment layer
a constructed KG needs: :mod:`.algebra` (SPARQL algebra over BGP solution
frames), :mod:`.sparql` (a SPARQL text subset front end), :mod:`.ops.validate`
(SHACL-lite shape validation), and :mod:`.reasoning` (rhoDF RDFS
forward chaining) — all plain Catalyst-visible DataFrame plans.

Everything here derives from public knowledge only: the Apache Spark API and
the W3C R2RML (https://www.w3.org/TR/r2rml/) and Direct Mapping
(https://www.w3.org/TR/rdb-direct-mapping/) Recommendations.
"""

__version__ = "0.1.0"

from .ir import (  # noqa: F401
    Mapping,
    TriplesMap,
    TermMap,
    RefObject,
    PredicateObjectMap,
)

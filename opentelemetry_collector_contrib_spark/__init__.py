"""PySpark-native re-expression of the OpenTelemetry Collector contrib
log pipeline (reference: sumo-drosiek/opentelemetry-collector-contrib
~v0.17.0, read-only at /root/reference).

NOT a port: the reference is a Go, push-based, in-memory streaming DAG of
receivers -> processors -> exporters.  This package re-expresses its
operator *semantics* as an idiomatic batch (and structured-streaming)
PySpark DAG over a table of pre-tokenized sequences
``(doc_id string, tokens array<int>, n_tok int, source string)``:

    read -> decode(tokens->body) -> parse (regex/json, severity, ts)
         -> enrich (broadcast lookup join)   [k8sprocessor analog]
         -> route (predicate fan-out)        [routingprocessor analog]
         -> aggregate (groupBy counts)       [groupbyattrsprocessor analog]
         -> per-sink writes                  [sumologic/loki exporter analogs]

Layout:
    functions/   reusable expression builders (severity table, strptime
                 layout translation, token codec)
    sources/     scans: tokens table, raw line tables (carbon/statsd)
    operators/   the processor analogs (parse/enrich/route/aggregate/...)
    sinks/       per-sink serialization + writers
    plans/       config-driven pipeline assembly + checkpoint manifest
    streaming/   structured-streaming variant
    datapipe/    large-scale training-data ops (dedup, ANN, text stats)
"""

__version__ = "0.1.0"

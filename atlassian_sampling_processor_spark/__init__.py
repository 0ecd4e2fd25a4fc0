"""atlassian_sampling_processor_spark — a PySpark-native tail-based trace
sampling pipeline, built from scratch with the query semantics of
atlassian-labs/atlassian-sampling-processor (the reference Go processor).

Architecture (SURVEY.md §7): a driver-orchestrated micro-batch DAG
(parse → enrich → decide → route → aggregate) over a tokenized-sequence
table ``(doc_id, tokens, n_tok, source)``, carrying two checkpointed
state tables (`pending_state`, `decision_state`) between batches.

All decision logic is expressed as Catalyst column expressions; the only
Python on the hot path is two vectorized (Arrow-batched) pandas stages:
the token parser and the FNV-1a64 hash used by the probabilistic policy.
"""

__version__ = "0.1.0"

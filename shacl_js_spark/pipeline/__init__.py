"""KG-construction pipeline (BASELINE.json north rule): interleaved text+media
documents -> mention detection -> entity-link scoring -> triple emission ->
connected-components canonicalization -> materialized triple/node/edge tables
with per-partition lineage + metrics, validated by the SHACL engine."""

from .synth import interleaved_documents, ENTITY_LEXICON
from .extract import extract_mentions
from .link import link_entities
from .emit import emit_triples
from .canonicalize import alias_edges, connected_components, canonicalize_triples
from .materialize import PipelineRunner

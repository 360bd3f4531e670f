"""Query-plan builders: the fluent RDFQuery-equivalent DataFrame API."""

from .query import RDFQueryDF

"""DASH function / target analogs (ref: shared/dash.js:438-464).

dash:toString is a scalar function over term columns; the DASH "all
objects/subjects" targets are whole-graph projections.  The reference binds
these via jsFunctionName in dash.ttl (dash.ttl:59, 79, 1005); here they are
plain Column/DataFrame helpers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .graph import object_decomposed, subject_decomposed

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def dash_to_string(value_prefix: str = "value") -> Column:
    """dash:toString (dash.js:441-451): literal -> its lexical form,
    IRI -> its uri, blank node -> null; result is an xsd:string lexical."""
    kind = F.col(f"{value_prefix}_kind")
    v = F.col(f"{value_prefix}_v")
    return F.when(kind == "literal", v).when(kind == "iri", v).otherwise(
        F.lit(None).cast("string")
    )


def all_objects(data: DataFrame, prefix: str = "focus") -> DataFrame:
    """dash:AllObjectsTarget (dash.js:457-459): distinct objects."""
    return data.select(*object_decomposed(prefix)).dropDuplicates([prefix])


def all_subjects(data: DataFrame, prefix: str = "focus") -> DataFrame:
    """dash:AllSubjectsTarget (dash.js:462-464): distinct subjects."""
    return data.select(*subject_decomposed("s", prefix)).dropDuplicates([prefix])

"""nexus_forge_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the capabilities of BlueBrain/nexus-forge.

The reference (read-only at /root/reference) is a single-process Python
framework: per-record rule ``eval`` mapping, in-memory resolver scans,
pySHACL validation, HTTP stores.  This package re-expresses every one of
those capabilities as set-oriented Spark DataFrame plans:

* mapping rules   -> compiled Column expression trees (operators/mapping.py)
* entity resolve  -> broadcast / salted joins + window top-k (operators/resolve.py)
* canonicalize    -> connected components over sameAs edges (operators/canonicalize.py)
* validation      -> compiled per-type predicate columns (operators/validate.py)
* triples         -> struct explosion -> (subj,pred,obj) dedup (operators/triples.py)
* store           -> versioned parquet table ops (store/)

See SURVEY.md for the full operator inventory mapping reference code
(file:line) to these modules.
"""

__version__ = "0.1.0"

from nexus_forge_spark.session import get_spark  # noqa: F401

"""nobletools_spark — PySpark-native biomedical KG-construction engine
(NobleCoder-compatible concept recognition, triple materialization, and
web-scale training-data operators). See README.md / SURVEY.md."""

__version__ = "0.1.0"

from nobletools_spark.model import (  # noqa: F401
    ConceptMeta,
    MatchConfig,
    TerminologyIndex,
)

__all__ = [
    "ConceptMeta",
    "MatchConfig",
    "TerminologyIndex",
    "__version__",
]


def __getattr__(name):
    # lazy heavy imports so `import nobletools_spark` stays instant
    if name == "NobleCoderSpark":
        from nobletools_spark.api import NobleCoderSpark

        return NobleCoderSpark
    if name == "annotate":
        from nobletools_spark.operators.matcher import annotate

        return annotate
    if name == "build_index":
        from nobletools_spark.index import build_index

        return build_index
    raise AttributeError(name)

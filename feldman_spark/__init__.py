"""feldman-spark: a PySpark-native engine with the query and data-processing
capabilities of the reference desktop tool (laccore/feldman), re-expressed
as distributed DataFrame operators, plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).
"""

from .session import get_spark
from .engine import (
    convert_sparse_splice,
    convert_sparse_splice_frames,
    export_measurement_data,
    export_measurement_frames,
)
from .io.csv import FormatError

__version__ = "0.1.0"

from .columns import ColumnIdentity, TabularDatatype, TabularFormat, las, map_columns
from .registry import (
    AFFINE_FORMAT,
    MANUAL_CORRELATION_FORMAT,
    MANUAL_OFFSET_FORMAT,
    MEASUREMENT_FORMAT,
    SECTION_SUMMARY_FORMAT,
    SIT_FORMAT,
    SPARSE_SPLICE_FORMAT,
    struct_type,
)

from .csv import (
    FormatError,
    apply_format,
    can_create_with_file,
    read_csv,
    read_headers,
    read_tabular,
    write_csv,
)

from .generate import (SPECTRAL_MODEL_VERSION, TableSpec, generate_table,
                       save_table, build_native)

__all__ = ["SPECTRAL_MODEL_VERSION", "TableSpec", "generate_table",
           "save_table", "build_native"]

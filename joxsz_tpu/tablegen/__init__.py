from .generate import TableSpec, generate_table, save_table, build_native

__all__ = ["TableSpec", "generate_table", "save_table", "build_native"]

from .pages import pages_dataset, read_table  # noqa: F401

from .scan import scan, scan_arrow  # noqa: F401

"""argparse helpers (reference /root/reference/utils/argparse_helpers.py)."""


def booltype(v: str) -> bool:
    """Strict 'True'/'False' CLI boolean."""
    if v in ("True", "true", "1"):
        return True
    if v in ("False", "false", "0"):
        return False
    raise ValueError(f"expected True/False, got {v!r}")

"""At-scale receipt / staging tools (host-side, not shipped in the
engine package).  Shared helpers live in :mod:`tools.scale_common`."""

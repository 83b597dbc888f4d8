"""Assemble the full declared-query registry for the driver contract."""

from __future__ import annotations

from .base import Q


def all_queries() -> dict[str, Q]:
    from . import relational

    registry: dict[str, Q] = {}
    registry.update(relational.QUERIES)
    for mod_name in (
        "dedup_queries",
        "text_queries",
        "similarity_queries",
        "multimodal_queries",
        "message_queries",
        "kernel_queries",
        "source_queries",
        "asof_queries",
        "window_queries",
        "sampling_queries",
        "streaming_queries",
    ):
        try:
            mod = __import__(f"{__package__}.{mod_name}", fromlist=["QUERIES"])
        except ImportError as exc:
            # Degrade loudly, not silently: a module-level import failure in
            # the driver environment would otherwise just vanish that
            # module's queries from the CORRECTNESS report.
            import sys

            print(
                f"WARNING: query module {mod_name} failed to import and was "
                f"skipped: {exc}",
                file=sys.stderr,
            )
            continue
        registry.update(mod.QUERIES)
    return registry

from .providers import (
    environment_provider,
    make_environment_provider,
    make_test_report_provider,
    scan_git_repositories,
)

__all__ = [
    "environment_provider",
    "make_environment_provider",
    "make_test_report_provider",
    "scan_git_repositories",
]

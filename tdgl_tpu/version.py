__version__ = "0.4.0"
__version_info__ = tuple(int(p) for p in __version__.split("."))


def _git_revision():
    import os
    import subprocess

    try:
        here = os.path.dirname(os.path.abspath(__file__))
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=here, capture_output=True, text=True, timeout=5,
        )
        return rev.stdout.strip() or None
    except Exception:
        return None


__git_revision__ = _git_revision()

"""Environment and dependency introspection (reference ``tdgl/about.py:54-103``)."""

from __future__ import annotations

import platform
import sys
from typing import Dict, Optional

from .version import __version__


def version_dict() -> Dict[str, str]:
    """Versions of tdgl_tpu and its key dependencies, plus platform info."""
    versions = {
        "tdgl_tpu": __version__,
        "python": sys.version,
        "platform": platform.platform(),
    }
    for module in ("jax", "jaxlib", "numpy", "scipy", "h5py", "matplotlib",
                   "cloudpickle"):
        try:
            mod = __import__(module)
            versions[module] = getattr(mod, "__version__", "unknown")
        except ImportError:
            versions[module] = "not installed"
    try:
        import jax

        versions["jax_backend"] = jax.default_backend()
        versions["jax_devices"] = ", ".join(str(d) for d in jax.devices())
    except Exception:
        pass
    return versions


def version_table(version_info: Optional[Dict[str, str]] = None) -> str:
    """An HTML table of version info (for notebooks)."""
    if version_info is None:
        version_info = version_dict()
    rows = ["<table>", "<tr><th>Software</th><th>Version</th></tr>"]
    for key, value in version_info.items():
        rows.append(f"<tr><td>{key}</td><td>{value}</td></tr>")
    rows.append("</table>")
    html = "".join(rows)
    try:
        from IPython.display import HTML

        return HTML(html)
    except ImportError:
        return html

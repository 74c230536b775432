"""Index aliases — named, atomically-swappable pointers to artifacts.

The ES alias analog: serving talks to a NAME; a reindex/compact/merge
builds a new artifact directory and repoints the alias in one atomic
rename, so readers never observe a half-written artifact and blue/green
cutover is a metadata operation.  The alias store is a single JSON file
(``aliases.json``) in a registry directory; writes go through a temp
file + ``os.replace`` (atomic on POSIX).

Reference analog: the reference hot-swaps its global FAISS index object
behind an asyncio lock (/root/reference/src/refimage/search/__init__.py:
362-396) — same intent, process-local only; an alias file makes the
swap visible to EVERY process serving the corpus.
"""

from __future__ import annotations

import json
import os

ALIAS_FILE = "aliases.json"


def _path(registry_dir: str) -> str:
    return os.path.join(registry_dir, ALIAS_FILE)


def load_aliases(registry_dir: str) -> dict[str, str]:
    p = _path(registry_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def set_alias(registry_dir: str, name: str, index_dir: str) -> None:
    """Point ``name`` at ``index_dir`` (must hold a manifest) — atomic."""
    from refimage_ray.index.manifest import load_manifest

    if load_manifest(index_dir) is None:
        raise FileNotFoundError(f"no artifact manifest under {index_dir}")
    os.makedirs(registry_dir, exist_ok=True)
    aliases = load_aliases(registry_dir)
    aliases[name] = os.path.abspath(index_dir)
    tmp = _path(registry_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(aliases, f, indent=1, sort_keys=True)
    os.replace(tmp, _path(registry_dir))


def drop_alias(registry_dir: str, name: str) -> bool:
    aliases = load_aliases(registry_dir)
    if name not in aliases:
        return False
    del aliases[name]
    tmp = _path(registry_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(aliases, f, indent=1, sort_keys=True)
    os.replace(tmp, _path(registry_dir))
    return True


def resolve_alias(registry_dir: str, name: str) -> str:
    """Alias → artifact dir; a literal artifact dir passes through, so
    every entry point can accept either."""
    aliases = load_aliases(registry_dir)
    if name in aliases:
        return aliases[name]
    raise KeyError(f"no alias {name!r} in {registry_dir} "
                   f"(have: {sorted(aliases)})")

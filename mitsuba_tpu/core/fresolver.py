"""File resolver: ordered search paths for scene resources
(reference: src/core/fresolver.cpp FileResolver, used by the XML loader for
meshes/textures/spectra; the `mitsuba -a <path>` CLI flag appends entries,
reference: src/mitsuba/mitsuba.cpp:38-107).

A single process-wide resolver matches the reference's thread-local one in
our single-interpreter setting."""
from __future__ import annotations

import os


class FileResolver:
    """Ordered list of directories tried in turn by resolve()
    (reference: include/mitsuba/core/fresolver.h)."""

    def __init__(self, paths=None):
        self.paths = list(paths) if paths else [os.getcwd()]

    def append(self, path):
        self.paths.append(str(path))

    def prepend(self, path):
        self.paths.insert(0, str(path))

    def clear(self):
        self.paths = []

    def resolve(self, name):
        """Return the first existing `dir/name`; falls back to `name`
        unchanged (the reference returns the unmodified path when no search
        entry matches, fresolver.cpp::resolve)."""
        if os.path.isabs(name) and os.path.exists(name):
            return name
        for p in self.paths:
            cand = os.path.join(p, name)
            if os.path.exists(cand):
                return cand
        return name

    def __iter__(self):
        return iter(self.paths)

    def __len__(self):
        return len(self.paths)

    def __repr__(self):
        return f"FileResolver[{', '.join(self.paths)}]"


_resolver = FileResolver()


def file_resolver():
    """mi.file_resolver() parity (reference: mitsuba.file_resolver())."""
    return _resolver

"""Shared scratch-directory layout for queries that materialize
intermediate artifacts (format round-trips, bucketed tables). One
slot per sf_dir so scale factors never collide."""

from __future__ import annotations

import hashlib
import os

WORK_BASE = "/tmp/flume_source_spark_io"


def slot(sf_dir: str, name: str) -> str:
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(WORK_BASE, h, name)

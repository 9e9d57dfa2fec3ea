"""URL weight caching (reference utils/model_zoo.py:20 cache_url +
utils/checkpoint.py:132-154 resolution chain).

``MODEL.WEIGHT`` may be a local path, a ``catalog://`` key
(data/paths_catalog.py::ModelCatalog), or an http(s) URL.  URLs resolve
through this cache: ``$CMPL_TPU_MODEL_ZOO`` (default
``~/.cache/cmpl_tpu/models``) keyed by the URL's filename — Detectron's
shared ``model_final.pkl`` names are disambiguated by flattening the
full path, exactly like the reference.  Only process 0 downloads; a
zero-egress environment with a pre-populated cache works offline and a
cache miss raises a clear error instead of hanging.
"""

import os
import re
from urllib.parse import urlparse

_HASH_RE = re.compile(r"-([a-f0-9]*)\.")


def default_cache_dir() -> str:
    return os.environ.get(
        "CMPL_TPU_MODEL_ZOO",
        os.path.join(
            os.path.expanduser("~"), ".cache", "cmpl_tpu", "models"
        ),
    )


def cache_url(url: str, model_dir: str = None, progress: bool = True) -> str:
    """Returns the local path of ``url``, downloading it into the cache
    on first use (process 0 only; other processes wait).

    Every process enters the barrier unconditionally — a conditional
    barrier deadlocks whenever processes disagree on cache state (e.g.
    a process that arrives after process 0's download completed would
    skip the sync the others are waiting in).  Note the cache dir is
    host-local: on a multi-host pod either point ``CMPL_TPU_MODEL_ZOO``
    at shared storage or pre-populate every host (the post-barrier
    existence check gives each host a clear error rather than a hang).
    """
    import jax

    model_dir = model_dir or default_cache_dir()
    os.makedirs(model_dir, exist_ok=True)
    parts = urlparse(url)
    filename = os.path.basename(parts.path)
    if filename == "model_final.pkl":
        # Detectron zoo: every model is model_final.pkl — flatten the
        # path into the name (reference model_zoo.py:46-48)
        filename = parts.path.replace("/", "_")
    cached_file = os.path.join(model_dir, filename)
    error = None
    if not os.path.exists(cached_file) and jax.process_index() == 0:
        error = _download(url, cached_file, progress)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("cache_url")
    if not os.path.exists(cached_file):
        if error and error.startswith("hash mismatch"):
            # corrupt/tampered download — distinct from a cache miss
            raise ValueError(f"weight URL {url}: {error}")
        detail = f": {error}" if error else ""
        raise FileNotFoundError(
            f"weight URL {url} not in cache {model_dir} and download "
            f"failed{detail} — pre-populate the cache on this host "
            "(zero-egress environment, or host-local cache dir on a "
            "multi-host pod?)"
        )
    return cached_file


def _download(url: str, dst: str, progress: bool):
    """Downloads ``url`` to ``dst``.  ALL failures — network-layer and
    hash mismatch alike — are returned as a message rather than raised:
    in a multi-process run every process must reach the cache_url
    barrier, so nothing may raise before it.  The caller raises one
    clear post-barrier error (ValueError for a hash mismatch so it is
    not mistaken for a cache miss)."""
    import shutil
    import sys
    import tempfile
    import urllib.request

    sys.stderr.write(f'Downloading: "{url}" to {dst}\n')
    tmp_fd, tmp_path = tempfile.mkstemp(dir=os.path.dirname(dst))
    os.close(tmp_fd)
    try:
        try:
            with urllib.request.urlopen(url, timeout=60) as r, open(
                tmp_path, "wb"
            ) as f:
                shutil.copyfileobj(r, f)
        except Exception as e:  # network-layer failure: report, don't mask
            sys.stderr.write(f"download failed: {type(e).__name__}: {e}\n")
            return f"{type(e).__name__}: {e}"
        try:
            _verify_hash(tmp_path, dst)
        except ValueError as e:
            sys.stderr.write(f"{e}\n")
            return str(e)
        os.replace(tmp_path, dst)
        return None
    finally:
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)


def _verify_hash(path: str, dst: str) -> None:
    """torch-zoo convention: filename-<sha256prefix>.ext (prefix >= 6
    chars; Caffe2 names carry shorter non-hash suffixes, skipped like
    the reference, model_zoo.py:53-59)."""
    m = _HASH_RE.search(os.path.basename(dst))
    if not m or len(m.group(1)) < 6:
        return
    import hashlib

    sha = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            sha.update(chunk)
    digest = sha.hexdigest()
    if not digest.startswith(m.group(1)):
        raise ValueError(
            f"hash mismatch for {dst}: expected prefix {m.group(1)}, "
            f"got {digest[:16]}"
        )


def resolve_weight_path(weight: str) -> str:
    """The checkpoint.py:132-154 resolution chain: catalog:// -> URL or
    path; http(s):// -> cache_url; anything else returned as-is."""
    if not weight:
        return weight
    if weight.startswith("catalog://"):
        from ..data.paths_catalog import ModelCatalog

        weight = ModelCatalog.get(weight)
    if weight.startswith(("http://", "https://")):
        weight = cache_url(weight)
    return weight

"""Multi-file deep-merged configuration (reference A19 — YamlConfig,
rabbit_indexer/utils/yaml_config.py:23-118).

Same observable semantics, replicated field-for-field:

* ``read(files)`` reads each file in order, silently skipping unopenable
  ones, deep-merging later files into earlier ones (yaml_config.py:23-59);
* merge rules (``data_merge``, :82-118): primitives/None are overwritten
  by the newcomer; lists extend (or append a scalar); dicts merge
  recursively; merging a non-dict into a dict raises ``MergeError``;
* ``get(*keys, default=None)`` walks the nesting, returning ``default``
  on any missing key, and raises ``ValueError`` when no config is loaded
  (:61-80).
"""

from __future__ import annotations

import json
import os


class MergeError(Exception):
    """Reference: YamlMergeError."""


class EngineConfig:
    def __init__(self, config: dict | None = None):
        self.config: dict = config or {}

    # ------------- reading -------------

    def read(self, files: list[str]) -> list[str]:
        """Read + deep-merge config files (YAML if available, else JSON).
        Returns the list of files successfully read; unopenable files are
        skipped silently (reference behavior)."""
        read_ok = []
        for filename in files:
            try:
                with open(filename) as f:
                    if filename.endswith((".yml", ".yaml")):
                        import yaml

                        data = yaml.safe_load(f)
                    else:
                        data = json.load(f)
            except OSError:
                continue
            self.config = self.data_merge(self.config, data or {})
            read_ok.append(os.fspath(filename))
        return read_ok

    # ------------- access -------------

    def get(self, *args, default=None):
        """Walk nested keys; ``default`` if any level is missing."""
        if not self.config:
            raise ValueError("No config loaded")
        node = self.config
        for key in args[:-1]:
            node = node.get(key, {}) if isinstance(node, dict) else {}
        if not isinstance(node, dict):
            return default
        return node.get(args[-1], default)

    # ------------- merging -------------

    def data_merge(self, a, b):
        """Merge ``b`` into ``a`` (reference rules, yaml_config.py:82-118)."""
        key = None
        try:
            if a is None or isinstance(a, (str, int, float)):
                a = b  # primitives: newcomer wins
            elif isinstance(a, list):
                if isinstance(b, list):
                    a.extend(b)
                else:
                    a.append(b)
            elif isinstance(a, dict):
                if isinstance(b, dict):
                    for key in b:  # noqa: PLW2901
                        a[key] = self.data_merge(a[key], b[key]) if key in a else b[key]
                else:
                    raise MergeError(f'Cannot merge non-dict "{b}" into dict "{a}"')
            else:
                raise MergeError(f'NOT IMPLEMENTED "{b}" into "{a}"')
        except TypeError as e:
            raise MergeError(
                f'TypeError "{e}" in key "{key}" when merging "{b}" into "{a}"'
            ) from e
        return a

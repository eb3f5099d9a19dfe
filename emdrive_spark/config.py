"""Launch configuration from environment variables — parity with the
reference's ops story (/root/reference/src/config.rs:5-48): each config
key reads ``EMDRIVE_<KEY>`` with a built-in default.

Keys (reference names, config.rs:6-12):
- ``data_directory``  — path to saved catalog state (save/restore root)
- ``tcp_listen_host`` — listener host, default 127.0.0.1
- ``tcp_listen_port`` — listener port, default 8824

The reference's transport is a raw TCP listener; ours is HTTP on the
same host/port contract, so the env names are kept verbatim.

Engine-quality addition (no reference twin — its encoder serializes
every row unconditionally, encoding.rs:327-338, which on a distributed
engine is a driver OOM waiting for a no-LIMIT SELECT):
- ``max_result_rows`` — HTTP result-set ceiling, default 100_000 rows;
  <= 0 disables the cap (reference-faithful unbounded mode).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

_DEFAULTS = {
    "data_directory": "/var/lib/emdrive/data",  # config.rs:17
    "tcp_listen_host": "127.0.0.1",
    "tcp_listen_port": 8824,
    "max_result_rows": 100_000,
}


def _envify(key: str) -> str:
    """config key -> env var name (config.rs:52-54)."""
    return f"EMDRIVE_{key.upper()}"


@dataclass(frozen=True)
class Config:
    data_directory: str = _DEFAULTS["data_directory"]
    tcp_listen_host: str = _DEFAULTS["tcp_listen_host"]
    tcp_listen_port: int = _DEFAULTS["tcp_listen_port"]
    max_result_rows: int = _DEFAULTS["max_result_rows"]

    @classmethod
    def from_env(cls) -> "Config":
        """Read each key from EMDRIVE_* with defaults (config.rs:40-48).
        A non-numeric integer falls back to the default, mirroring the
        reference's parse-or-default cast (config.rs:66-74)."""

        def _int_env(key: str) -> int:
            raw = os.environ.get(_envify(key), "")
            try:
                return int(raw) if raw else _DEFAULTS[key]
            except ValueError:
                return _DEFAULTS[key]

        return cls(
            data_directory=os.environ.get(
                _envify("data_directory"), _DEFAULTS["data_directory"]
            ),
            tcp_listen_host=os.environ.get(
                _envify("tcp_listen_host"), _DEFAULTS["tcp_listen_host"]
            ),
            tcp_listen_port=_int_env("tcp_listen_port"),
            max_result_rows=_int_env("max_result_rows"),
        )

    def render(self) -> str:
        """Display form, one ENV_NAME='value' per line (config.rs:24-37)."""
        return "\n".join(
            f"{_envify(k)}={getattr(self, k)!r}"
            for k in (
                "data_directory",
                "tcp_listen_host",
                "tcp_listen_port",
                "max_result_rows",
            )
        )

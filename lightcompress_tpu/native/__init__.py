"""Native (C++) runtime components.

- ``st_stream``: mmap-backed zero-copy safetensors shard streamer (the
  checkpoint-IO hot path for 100B+ loads).
"""

from .st_stream import NativeShardStreamer, native_available  # noqa: F401

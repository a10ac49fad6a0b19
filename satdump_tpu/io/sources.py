"""Sample-source abstraction + registry.

Reference: src-core/common/dsp_source_sink/dsp_sample_source.h:26-83 — the
open/start/stop/close + set_frequency/set_samplerate surface every SDR
driver implements, with a registry + event hook so plugins can add sources.
TPU hosts have no SDR hardware (SURVEY §7: protocol clients in scope,
drivers out), so the built-ins are the file player and the remote-IQ
network client; hardware support arrives by registering more sources."""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np

from satdump_tpu.core.events import event_bus
from satdump_tpu.core.log import logger


class SampleSource:
    """Abstract source (dsp_sample_source.h API shape)."""

    source_type = "base"

    def __init__(self, params: Optional[dict] = None):
        self.d_params = dict(params or {})
        self.samplerate = float(self.d_params.get("samplerate", 0))
        self.frequency = float(self.d_params.get("frequency", 0))
        self.started = False

    # lifecycle (open/start/stop/close)
    def open(self) -> None: ...

    def start(self) -> None:
        self.started = True

    def stop(self) -> None:
        self.started = False

    def close(self) -> None: ...

    # tuning
    def set_frequency(self, hz: float) -> None:
        self.frequency = hz

    def set_samplerate(self, sps: float) -> None:
        self.samplerate = sps

    def get_samplerate(self) -> float:
        return self.samplerate

    # streaming
    def blocks(self) -> Iterator[np.ndarray]:
        raise NotImplementedError


class FileSource(SampleSource):
    """Baseband file playback (dsp_source_sink/file_source.h), optionally
    throttled to real time."""

    source_type = "file"

    def __init__(self, params=None):
        super().__init__(params)
        self.path = self.d_params["path"]
        self.fmt = str(self.d_params.get("baseband_format", "cf32"))
        self.block_size = int(self.d_params.get("block_size", 1 << 18))
        self.throttle = bool(self.d_params.get("throttle", False))

    def blocks(self) -> Iterator[np.ndarray]:
        from satdump_tpu.io.baseband import BasebandReader
        reader = BasebandReader(self.path, self.fmt,
                                block_size=self.block_size)
        for blk in reader.blocks():
            if self.throttle and self.samplerate > 0:
                time.sleep(blk.valid / self.samplerate)
            yield blk.samples[: blk.valid]


class RemoteSource(SampleSource):
    """Remote-IQ network client (plugins/sdr_sources/remote_sdr_support)."""

    source_type = "remote"

    def __init__(self, params=None):
        super().__init__(params)
        self.host = str(self.d_params.get("host", "127.0.0.1"))
        self.port = int(self.d_params["port"])
        self._client = None

    def open(self) -> None:
        from satdump_tpu.io.net import RemoteIQClient
        self._client = RemoteIQClient(self.host, self.port)

    def blocks(self) -> Iterator[np.ndarray]:
        if self._client is None:
            self.open()
        yield from self._client.blocks()

    def close(self) -> None:
        if self._client is not None:
            self._client.close()
            self._client = None


# -- registry (dsp_sample_source.h:68-83) ------------------------------------
source_registry: Dict[str, Callable[[dict], SampleSource]] = {}


class RegisterSampleSourcesEvent:
    def __init__(self, registry: dict):
        self.registry = registry


def register_source(cls) -> type:
    source_registry[cls.source_type] = cls
    return cls


register_source(FileSource)
register_source(RemoteSource)


def get_source(descriptor: str | dict) -> SampleSource:
    """Build a source from a descriptor: a dict {type, ...}, or a spec
    string (file://path, tcp://host:port, plain path)."""
    if isinstance(descriptor, dict):
        t = descriptor.get("type", "file")
    else:
        s = str(descriptor)
        if s.startswith("tcp://"):
            host, port = s[6:].rsplit(":", 1)
            descriptor = {"type": "remote", "host": host, "port": int(port)}
            t = "remote"
        else:
            descriptor = {"type": "file",
                          "path": s[7:] if s.startswith("file://") else s}
            t = "file"
    if t not in source_registry:
        ev = RegisterSampleSourcesEvent(source_registry)
        event_bus.fire_event(ev)
    if t not in source_registry:
        raise KeyError(f"no sample source '{t}'")
    return source_registry[t](descriptor)


def list_sources() -> List[str]:
    ev = RegisterSampleSourcesEvent(source_registry)
    event_bus.fire_event(ev)
    return sorted(source_registry)

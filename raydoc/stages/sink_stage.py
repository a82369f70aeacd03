"""Generic idempotent side-effect sink: the engine form of the
reference's Email component (/root/reference/agent/component/
email.py:47-123) and of any other at-most-once-per-key external action
(webhook, notification, upload).

Semantics:

* each row carries a KEY (``key_col``); the sink performs
  ``effect(row)`` for a key AT MOST ONCE across runs and retries,
  enforced by a per-key ledger of commit files (one ``<md5(key)>.json``
  per delivered key, written tmp+rename like the partition manifests,
  state/manifest.py) — re-running a pipeline, or Ray retrying a task,
  re-delivers nothing.
* a crash BETWEEN the effect and its ledger commit re-runs the effect
  on restart: the guarantee is at-least-once delivery with at-most-once
  per committed key, which is the strongest a sink can promise without
  a transactional receiver (the reference offers less: it just
  re-sends).
* per-row failures are IN-BAND status rows (the reference's
  "Email failed" answer, email.py:113-123), never job failures.
* validation mirrors the reference: a row missing ``to`` is rejected
  in-band ("Missing required field: to_email", email.py:63-64).

The default effect is the OFFLINE OUTBOX: one durably-renamed file per
message under ``outbox_dir`` — the same transport seam as
sources.connectors (SMTP would plug in where ``_deliver`` writes).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from raydoc.hashing import md5_hex

__all__ = ["SideEffectSink", "side_effect_sink"]


def _atomic_write_text(path: str, text: str) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, path)


class SideEffectSink:
    """map_batches stage: perform an external effect once per key.

    Parameters
    ----------
    ledger_dir: directory of per-key commit files (shared across runs;
        on a cluster this is shared storage, same as the manifests).
    outbox_dir: where the default file-outbox effect delivers.
    effect: optional ``fn(row_dict) -> None`` replacing the outbox
        (raise to signal failure); the ledger logic is unchanged.
    key_col / payload_cols: delivery key and the fields passed to the
        effect.
    """

    def __init__(self, ledger_dir: str, outbox_dir: str | None = None,
                 key_col: str = "to", payload_cols: list[str] | None = None,
                 effect=None) -> None:
        self.ledger_dir = ledger_dir
        self.outbox_dir = outbox_dir or os.path.join(ledger_dir, "outbox")
        os.makedirs(self.ledger_dir, exist_ok=True)
        os.makedirs(self.outbox_dir, exist_ok=True)
        self.key_col = key_col
        self.payload_cols = payload_cols
        self.effect = effect
        # ledger snapshot once per actor; per-key files are re-checked
        # before any send, so a stale snapshot only costs a stat()
        self.seen = {f[:-5] for f in os.listdir(self.ledger_dir)
                     if f.endswith(".json")}

    def _deliver(self, row: dict, key: str) -> None:
        if self.effect is not None:
            self.effect(row)
            return
        _atomic_write_text(
            os.path.join(self.outbox_dir, f"{md5_hex(key)}.json"),
            json.dumps(row, default=str, sort_keys=True),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        status = []
        for row in rows:
            key = row.get(self.key_col)
            if key is None or key == "":  # 0 is a valid key
                # the reference's required-field rejection (email.py:63)
                status.append(f"error:missing {self.key_col}")
                continue
            key = str(key)
            kh = md5_hex(key)
            ledger_path = os.path.join(self.ledger_dir, f"{kh}.json")
            if kh in self.seen or os.path.exists(ledger_path):
                self.seen.add(kh)
                status.append("skipped:already-delivered")
                continue
            payload = ({c: row.get(c) for c in self.payload_cols}
                       if self.payload_cols else dict(row))
            try:
                self._deliver(payload, key)
            except Exception as e:  # in-band, like email.py:113-123
                status.append(f"error:{type(e).__name__}:{str(e)[:120]}")
                continue
            # commit AFTER the effect: crash in between -> re-delivered
            # on restart (at-least-once), never silently dropped
            _atomic_write_text(ledger_path,
                               json.dumps({"key": key}, sort_keys=True))
            self.seen.add(kh)
            status.append("sent")
        return batch.append_column("sink_status",
                                   pa.array(status, pa.string()))


def side_effect_sink(ds, ledger_dir: str, key_col: str = "to",
                     payload_cols: list[str] | None = None,
                     outbox_dir: str | None = None,
                     concurrency=None, batch_size: int = 256):
    """Dataset wrapper: returns the input rows + ``sink_status``.

    NOTE: keys must not collide across concurrent actors mid-run for
    strict once-per-key (two actors can race the same key's first
    delivery — the rename makes the LEDGER idempotent, but the effect
    may fire twice). Route rows by key first
    (``groupby(key).map_groups`` or a key-hash repartition) when the
    input can contain duplicate keys, exactly like the flagship routes
    url-hash partitions.
    """
    from raydoc.util import cpu_cap

    return ds.map_batches(
        SideEffectSink,
        fn_constructor_kwargs={
            "ledger_dir": ledger_dir, "outbox_dir": outbox_dir,
            "key_col": key_col, "payload_cols": payload_cols,
        },
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or (1, cpu_cap()),
    )

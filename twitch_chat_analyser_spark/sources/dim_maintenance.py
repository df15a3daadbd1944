"""Dimension-table maintenance utilities (SURVEY.md §2.A A15/A16).

The reference maintains the ``emotes``/``channels`` dims by polling four
HTTP emote providers and inserting unseen names with
``INSERT ... ON CONFLICT DO NOTHING`` (EmoteExtractor.java:115-178,
:246-262), and maintains the ``streams`` uptime table by upserting the
current span's ``ended_at`` on a 150 s cooldown (Bot.java:145-232).

These are side-effecting utilities AROUND the engine — the engine itself
only broadcast-reads the dim tables. Rebuilt here as:

- pure payload parsers for each provider's wire shape (the HTTP fetch
  itself is environment-dependent and injected; tests use deterministic
  fake payloads), and
- pure DataFrame merge functions implementing the same upsert semantics
  (insert-if-absent keyed on the PK; span-update keyed on
  ``(channel, started_at)``), usable against any store that can read
  back the previous dim state.

Scale note: dims are small by construction (emote vocabularies, channel
lists) — every merge here is a broadcast anti-join against a table that
fits in one executor; nothing in this module touches fact-scale data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dims import EMOTE_TYPES

# ---------------------------------------------------------------------------
# Provider payload parsers (A15). One per provider wire shape.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class EmoteFetchResult:
    """Parity with the reference's EmoteFetchResult: a set of emote
    names, the provider's EmoteType code, and the channel the fetch was
    scoped to (None = global)."""

    emote_type: int
    emotes: frozenset[str]
    channel: str | None = None


def parse_twitch(payload: dict, channel: str | None = None) -> EmoteFetchResult:
    """Helix emote list: ``{"data": [{"name": ...}, ...]}``
    (TwitchEmoteProvider.java:28-55). Channel-scoped fetches yield
    TWITCH_SUBSCRIBER, global ones TWITCH_GLOBAL."""
    names = frozenset(e["name"] for e in payload.get("data", []))
    etype = (
        EMOTE_TYPES["TWITCH_SUBSCRIBER"] if channel else EMOTE_TYPES["TWITCH_GLOBAL"]
    )
    return EmoteFetchResult(etype, names, channel)


def parse_bttv(payload: dict, channel: str | None = None) -> EmoteFetchResult:
    """BTTV: ``{"emotes": [{"code": ...}, ...]}``
    (BTTVEmoteProvider.java:42-55)."""
    if "emotes" not in payload:
        raise ValueError("Response does not include emotes array")
    names = frozenset(e["code"] for e in payload["emotes"])
    return EmoteFetchResult(EMOTE_TYPES["BTTV"], names, channel)


def parse_ffz(payload: dict, channel: str | None = None) -> EmoteFetchResult:
    """FFZ: global = ``{"default_sets": [id...], "sets": {id:
    {"emoticons": [{"name"}...]}}}`` restricted to the default sets;
    room = all sets (FFZEmoteProvider.java:23-87)."""
    if "sets" not in payload:
        raise ValueError("Invalid response: 'sets' object missing")
    if channel is None:
        if "default_sets" not in payload:
            raise ValueError("Invalid response: 'default_sets' object missing")
        set_ids = [str(i) for i in payload["default_sets"]]
    else:
        set_ids = list(payload["sets"].keys())
    names = frozenset(
        e["name"]
        for sid in set_ids
        for e in payload["sets"][sid].get("emoticons", [])
    )
    return EmoteFetchResult(EMOTE_TYPES["FFZ"], names, channel)


def parse_seventv(payload: list, channel: str | None = None) -> EmoteFetchResult:
    """7TV: a bare array ``[{"name": ...}, ...]``
    (SevenTVEmoteProvider.java:49-57)."""
    names = frozenset(e["name"] for e in payload)
    return EmoteFetchResult(EMOTE_TYPES["SEVENTV"], names, channel)


# ---------------------------------------------------------------------------
# Dim merges (insert-if-absent / span-upsert semantics)
# ---------------------------------------------------------------------------


def merge_new_emotes(existing: DataFrame, fetched: list[EmoteFetchResult]) -> DataFrame:
    """``INSERT ... ON CONFLICT (emote) DO NOTHING``
    (EmoteExtractor.java:246-262): rows for names not already present;
    first fetch wins among duplicates within the batch (stable order:
    results are applied in sequence, like the reference's provider
    loop).

    -> the updated emotes dim (emote, type, channel)
    """
    spark = existing.sparkSession
    rows, seen = [], set()
    for res in fetched:
        for name in sorted(res.emotes):
            if name not in seen:
                seen.add(name)
                rows.append((name, res.emote_type, res.channel))
    if not rows:
        return existing
    candidates = spark.createDataFrame(rows, existing.schema)
    new_rows = candidates.join(
        F.broadcast(existing.select("emote")), "emote", "left_anti"
    )
    return existing.unionByName(new_rows)


def sync_channels(existing: DataFrame, seen_channels: list[str]) -> DataFrame:
    """Insert channels observed in the stream but missing from the dim
    (EmoteExtractor.java:180-216); broadcaster_id unknown (NULL),
    not hidden."""
    spark = existing.sparkSession
    if not seen_channels:
        return existing
    candidates = spark.createDataFrame(
        [(c, None, False) for c in sorted({ch.lower() for ch in seen_channels})],
        existing.schema,
    )
    new_rows = candidates.join(
        F.broadcast(existing.select("channel")), "channel", "left_anti"
    )
    return existing.unionByName(new_rows)


def update_stream_span(
    streams: DataFrame,
    channel: str,
    channel_id: str,
    started_at_ms: int,
    now_ms: int,
) -> DataFrame:
    """The Bot's uptime-span upsert (Bot.java:145-232): key
    ``(channel, started_at)``; on conflict extend ``ended_at`` to now.
    The caller applies the 150 s cooldown (bot.example.properties:17) —
    this function is the pure merge.

    streams schema: channel, channel_id, started_at_ms, ended_at_ms
    """
    spark = streams.sparkSession
    row = spark.createDataFrame(
        [(channel, channel_id, started_at_ms, now_ms)], streams.schema
    )
    untouched = streams.join(
        row.select("channel", "started_at_ms"),
        ["channel", "started_at_ms"],
        "left_anti",
    )
    # anti-join promotes its keys to the front; restore the table order
    # so repeated upserts keep a stable schema
    return untouched.select(*streams.columns).unionByName(row)

"""A15/A16 dim-maintenance: provider payload parsing against each
provider's documented wire shape, insert-if-absent merge semantics, and
the stream-span upsert."""

from __future__ import annotations

import pytest

from twitch_chat_analyser_spark import dims
from twitch_chat_analyser_spark.sources import dim_maintenance as dm

# Deterministic fakes of each provider's wire shape.
TWITCH_GLOBAL_PAYLOAD = {"data": [{"name": "Kappa"}, {"name": "PogChamp"}]}
TWITCH_CHANNEL_PAYLOAD = {"data": [{"name": "subHype"}]}
BTTV_PAYLOAD = {"emotes": [{"code": "bttvSmile"}, {"code": "bttvDance"}]}
FFZ_GLOBAL_PAYLOAD = {
    "default_sets": [3],
    "sets": {
        "3": {"emoticons": [{"name": "ffzWow"}]},
        "99": {"emoticons": [{"name": "notDefault"}]},
    },
}
FFZ_ROOM_PAYLOAD = {"sets": {"7": {"emoticons": [{"name": "roomEmote"}]}}}
SEVENTV_PAYLOAD = [{"name": "sevenHi"}, {"name": "sevenYo"}]


def test_parsers_extract_names_and_types():
    g = dm.parse_twitch(TWITCH_GLOBAL_PAYLOAD)
    assert g.emotes == {"Kappa", "PogChamp"}
    assert g.emote_type == dims.EMOTE_TYPES["TWITCH_GLOBAL"] and g.channel is None

    c = dm.parse_twitch(TWITCH_CHANNEL_PAYLOAD, channel="click")
    assert c.emote_type == dims.EMOTE_TYPES["TWITCH_SUBSCRIBER"]
    assert c.channel == "click"

    assert dm.parse_bttv(BTTV_PAYLOAD).emotes == {"bttvSmile", "bttvDance"}

    # global FFZ restricts to default_sets; room FFZ takes all sets
    assert dm.parse_ffz(FFZ_GLOBAL_PAYLOAD).emotes == {"ffzWow"}
    assert dm.parse_ffz(FFZ_ROOM_PAYLOAD, channel="click").emotes == {"roomEmote"}

    assert dm.parse_seventv(SEVENTV_PAYLOAD).emotes == {"sevenHi", "sevenYo"}


def test_parsers_reject_malformed():
    with pytest.raises(ValueError):
        dm.parse_bttv({"nope": []})
    with pytest.raises(ValueError):
        dm.parse_ffz({"default_sets": [1]})  # sets missing
    with pytest.raises(ValueError):
        dm.parse_ffz({"sets": {}})  # global fetch needs default_sets


def test_merge_new_emotes_is_insert_if_absent(spark):
    existing = dims.emotes_df(spark)
    before = {r.emote for r in existing.collect()}
    fetched = [
        # Kappa already seeded -> must NOT be duplicated or retyped
        dm.parse_twitch({"data": [{"name": "Kappa"}, {"name": "newGlobal"}]}),
        dm.parse_bttv({"emotes": [{"code": "newGlobal"}]}, channel="click"),
    ]
    merged = dm.merge_new_emotes(existing, fetched)
    rows = {r.emote: r for r in merged.collect()}
    assert set(rows) == before | {"newGlobal"}
    # first fetch in sequence wins the within-batch conflict
    assert rows["newGlobal"].type == dims.EMOTE_TYPES["TWITCH_GLOBAL"]
    assert rows["newGlobal"].channel is None
    assert rows["Kappa"].type == dims.EMOTE_TYPES["TWITCH_GLOBAL"]
    # idempotent: re-applying the same fetch adds nothing
    again = dm.merge_new_emotes(merged, fetched)
    assert again.count() == merged.count()


def test_sync_channels_adds_only_unseen(spark):
    existing = dims.channels_df(spark)
    merged = dm.sync_channels(existing, ["click", "NEWCHAN", "newchan"])
    rows = {r.channel: r for r in merged.collect()}
    assert "newchan" in rows  # lowercased (EmoteExtractor.java:185)
    assert rows["newchan"].broadcaster_id is None
    assert rows["newchan"].hidden is False
    assert merged.count() == existing.count() + 1


def test_update_stream_span_upserts_ended_at(spark):
    schema = "channel string, channel_id string, started_at_ms long, ended_at_ms long"
    streams = spark.createDataFrame(
        [("click", "102", 1000, 2000), ("view", "105", 500, 900)], schema
    )
    # same span -> ended_at extended
    s1 = dm.update_stream_span(streams, "click", "102", 1000, 5000)
    rows = {(r.channel, r.started_at_ms): r.ended_at_ms for r in s1.collect()}
    assert rows[("click", 1000)] == 5000
    assert rows[("view", 500)] == 900
    assert len(rows) == 2
    # new span for the same channel -> new row
    s2 = dm.update_stream_span(s1, "click", "102", 7000, 7100)
    assert s2.count() == 3

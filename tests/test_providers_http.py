"""Emote-provider HTTP clients (sources/providers.py): the REAL socket
path — urllib against a loopback http.server speaking each provider's
wire shape — through the payload parsers into the insert-if-absent dim
merge. Closes the round-7 residual "payload parsers exist, no HTTP
client": the only thing this sandbox lacks is the public internet, and
the transport doesn't care which interface it crosses."""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from twitch_chat_analyser_spark import dims
from twitch_chat_analyser_spark.sources import providers as pv

PAYLOADS = {
    # Twitch Helix
    "/chat/emotes/global": {"data": [{"name": "Kappa"}, {"name": "httpGlobal"}]},
    "/chat/emotes?broadcaster_id=42": {"data": [{"name": "subOnly42"}]},
    # BTTV
    "/emotes": {"emotes": [{"code": "bttvGlobal"}]},
    "/channels/click": {"emotes": [{"code": "bttvClick"}]},
    # FFZ (global restricted to default_sets; room takes all sets)
    "/set/global": {
        "default_sets": [3],
        "sets": {
            "3": {"emoticons": [{"name": "ffzGlobal"}]},
            "9": {"emoticons": [{"name": "ffzNotDefault"}]},
        },
    },
    "/room/click": {"sets": {"77": {"emoticons": [{"name": "ffzClick"}]}}},
    # SevenTV (bare array; unknown channel -> 404)
    "/emotes/global": [{"name": "sevenGlobal"}],
    "/users/click/emotes": [{"name": "sevenClick"}],
}


class _Handler(http.server.BaseHTTPRequestHandler):
    seen_headers: list[dict] = []
    seen_paths: list[str] = []

    def do_GET(self):  # noqa: N802 — http.server API
        type(self).seen_headers.append(dict(self.headers))
        type(self).seen_paths.append(self.path)
        if self.path == "/boom":
            self.send_error(500, "kaboom")
            return
        if self.path not in PAYLOADS:
            self.send_error(404, "Not Found")
            return
        body = json.dumps(PAYLOADS[self.path]).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def base_url():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_get_json_http_maps_status_codes(base_url):
    assert pv.get_json_http(f"{base_url}/emotes")["emotes"]
    with pytest.raises(pv.NotFoundHttpError):
        pv.get_json_http(f"{base_url}/nope")
    with pytest.raises(RuntimeError, match="Code 500"):
        pv.get_json_http(f"{base_url}/boom")


def test_each_provider_fetches_and_parses_over_http(base_url):
    tw = pv.TwitchProvider("cid", "tok", base_url=base_url)
    g = tw.fetch_global()
    assert g.emotes == {"Kappa", "httpGlobal"}
    assert g.emote_type == dims.EMOTE_TYPES["TWITCH_GLOBAL"]
    c = tw.fetch_channel("click", broadcaster_id="42")
    assert c.emotes == {"subOnly42"}
    assert c.emote_type == dims.EMOTE_TYPES["TWITCH_SUBSCRIBER"]
    assert tw.fetch_channel("click", broadcaster_id=None) is None

    assert pv.BTTVProvider(base_url).fetch_global().emotes == {"bttvGlobal"}
    assert pv.BTTVProvider(base_url).fetch_channel("click").emotes == {
        "bttvClick"
    }
    # FFZ global is restricted to the default sets
    assert pv.FFZProvider(base_url).fetch_global().emotes == {"ffzGlobal"}
    assert pv.FFZProvider(base_url).fetch_channel("click").emotes == {
        "ffzClick"
    }
    assert pv.SevenTVProvider(base_url).fetch_global().emotes == {
        "sevenGlobal"
    }
    # SevenTV 404 on an unregistered channel is None, not an error
    assert pv.SevenTVProvider(base_url).fetch_channel("ghost") is None

    # the helix auth headers actually crossed the wire
    assert any(
        h.get("Client-Id") == "cid"
        and h.get("Authorization") == "Bearer tok"
        for h in _Handler.seen_headers
    )


def test_reload_emotes_end_to_end_survives_provider_outage(spark, base_url):
    existing = dims.emotes_df(spark)
    before = {r.emote for r in existing.collect()}

    class Broken:
        def fetch_global(self):
            # a dead provider: points at a route that 500s
            return pv.get_json_http(f"{base_url}/boom")

        def fetch_channel(self, channel, broadcaster_id=None):
            raise ConnectionError("provider down")

    logs: list[str] = []
    merged = pv.reload_emotes(
        [
            pv.TwitchProvider("cid", "tok", base_url=base_url),
            pv.BTTVProvider(base_url),
            pv.FFZProvider(base_url),
            pv.SevenTVProvider(base_url),
            Broken(),
        ],
        existing,
        channels={"click": "42", "ghost": None},
        log=logs.append,
    )
    got = {r.emote: r for r in merged.collect()}
    want_new = {
        "httpGlobal", "bttvGlobal", "ffzGlobal", "sevenGlobal",
        "subOnly42", "bttvClick", "ffzClick", "sevenClick",
    }
    # Kappa was already seeded: insert-if-absent, no duplicate
    assert set(got) == before | want_new
    assert got["bttvClick"].channel == "click"
    assert got["httpGlobal"].channel is None
    # the broken provider was logged and skipped, not fatal
    assert sum("Broken" in m for m in logs) >= 2
    # idempotent second cycle: nothing new
    again = pv.reload_emotes(
        [pv.BTTVProvider(base_url)], merged, {"click": None}, log=logs.append
    )
    assert again.count() == merged.count()


def test_reserved_channel_names_are_percent_encoded(base_url):
    """ADVICE r9 (low): channel names / broadcaster ids with reserved
    or non-ASCII characters must be percent-encoded before URL
    interpolation — an unencoded space is a malformed request line, an
    unencoded `/` injects an extra path segment."""
    # a name that would otherwise inject a path segment AND a space
    weird = "we ird/name"
    quoted = "we%20ird%2Fname"
    PAYLOADS[f"/channels/{quoted}"] = {"emotes": [{"code": "bttvWeird"}]}
    PAYLOADS[f"/room/{quoted}"] = {"sets": {"1": {"emoticons": [{"name": "ffzWeird"}]}}}
    PAYLOADS[f"/users/{quoted}/emotes"] = [{"name": "sevenWeird"}]
    PAYLOADS[f"/chat/emotes?broadcaster_id=4%202"] = {"data": [{"name": "twWeird"}]}

    assert pv.BTTVProvider(base_url).fetch_channel(weird).emotes == {"bttvWeird"}
    assert pv.FFZProvider(base_url).fetch_channel(weird).emotes == {"ffzWeird"}
    assert pv.SevenTVProvider(base_url).fetch_channel(weird).emotes == {"sevenWeird"}
    tw = pv.TwitchProvider("cid", "tok", base_url=base_url)
    assert tw.fetch_channel(weird, broadcaster_id="4 2").emotes == {"twWeird"}
    # the encoded forms are what actually crossed the wire
    for p in (
        f"/channels/{quoted}",
        f"/room/{quoted}",
        f"/users/{quoted}/emotes",
        "/chat/emotes?broadcaster_id=4%202",
    ):
        assert p in _Handler.seen_paths

"""HTTP emote-provider clients (SURVEY.md §2.A A15 — the fetch half).

The reference polls four providers over HTTP and inserts unseen emote
names (EmoteExtractor.java:115-178; provider/*.java). Round 7 carried
this as an environmental residual ("payload parsers exist, no HTTP
client"); this module closes it with a real client:

- :func:`get_json_http` is the parity twin of
  ``EmoteProvider.getJSONHttp`` (EmoteProvider.java:24-55): GET with a
  JSON content-type, connect/read timeout, 404 mapped to the typed
  :class:`NotFoundHttpError` (NotFoundHttpException.java), any other
  non-200 an error carrying code + message.
- one provider class per reference provider, each pairing the
  reference's URL scheme with the pure payload parser from
  :mod:`dim_maintenance`. ``base_url`` is injectable so tests exercise
  the REAL socket path against a loopback ``http.server`` — the only
  thing the sandbox lacks is the public internet, not HTTP.
- :func:`reload_emotes` is the ``reloadEmotes`` orchestration
  (EmoteExtractor.java:115-178): global fetch per provider, then
  channel fetch per (channel x provider), log-and-continue on per-fetch
  failure (a provider outage must not lose the cycle), ``None`` results
  skipped (SevenTV 404 = channel not registered,
  SevenTVEmoteProvider.java:34-45), and every successful result merged
  insert-if-absent.

Scale note: dim maintenance is driver-side by design — vocabularies
are broadcast-sized, the engine only reads the resulting dim table.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

from . import dim_maintenance as dm


def _q(component: str) -> str:
    """Percent-encode one path/query component before URL
    interpolation: a channel name or broadcaster id containing
    reserved or non-ASCII characters must not produce a malformed
    request that reload_emotes then re-logs every cycle (ADVICE r8
    low). ``safe=""`` also encodes ``/`` so a component can never
    inject extra path segments."""
    return urllib.parse.quote(str(component), safe="")

DEFAULT_TIMEOUT_S = 5.0

# the reference's production endpoints (provider/*.java); tests and
# air-gapped deployments inject a different base_url
TWITCH_HELIX_BASEURL = "https://api.twitch.tv/helix"
BTTV_API_BASEURL = "https://api.betterttv.net/2"
FFZ_API_BASEURL = "https://api.frankerfacez.com/v1"
SEVENTV_API_BASEURL = "https://api.7tv.app/v2"


class NotFoundHttpError(Exception):
    """404 — typed so callers can treat "not registered with this
    provider" as a non-error (NotFoundHttpException.java)."""


def get_json_http(
    url: str,
    timeout_s: float = DEFAULT_TIMEOUT_S,
    headers: dict[str, str] | None = None,
):
    """GET ``url`` and parse the JSON body — parity with
    ``EmoteProvider.getJSONHttp``: JSON content-type, timeout, 404 →
    :class:`NotFoundHttpError`, other non-200 → error with code and
    message."""
    req = urllib.request.Request(
        url, headers={"Content-Type": "application/json", **(headers or {})}
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return json.loads(resp.read().decode("utf-8"))
    except urllib.error.HTTPError as e:
        if e.code == 404:
            raise NotFoundHttpError("404 - Not Found") from e
        raise RuntimeError(
            f"Got HTTP error for request to URL '{url}': "
            f"Code {e.code}, Message: {e.reason}"
        ) from e


class TwitchProvider:
    """Helix chat-emotes API (TwitchEmoteProvider.java — the reference
    goes through the twitch4j Helix client; the wire shape is the Helix
    REST API those calls issue). Helix requires an app token."""

    def __init__(
        self,
        client_id: str = "",
        token: str = "",
        base_url: str = TWITCH_HELIX_BASEURL,
        timeout_s: float = DEFAULT_TIMEOUT_S,
    ) -> None:
        self.base_url = base_url
        self.timeout_s = timeout_s
        self.headers = {
            "Client-Id": client_id,
            "Authorization": f"Bearer {token}",
        }

    def fetch_global(self) -> dm.EmoteFetchResult:
        payload = get_json_http(
            f"{self.base_url}/chat/emotes/global", self.timeout_s, self.headers
        )
        return dm.parse_twitch(payload)

    def fetch_channel(self, channel: str, broadcaster_id: str | None = None):
        # reference skips channels with no resolved broadcaster id
        # (TwitchEmoteProvider.java:60)
        if broadcaster_id is None:
            return None
        payload = get_json_http(
            f"{self.base_url}/chat/emotes?broadcaster_id={_q(broadcaster_id)}",
            self.timeout_s,
            self.headers,
        )
        return dm.parse_twitch(payload, channel)


class BTTVProvider:
    def __init__(
        self,
        base_url: str = BTTV_API_BASEURL,
        timeout_s: float = DEFAULT_TIMEOUT_S,
    ) -> None:
        self.base_url = base_url
        self.timeout_s = timeout_s

    def fetch_global(self) -> dm.EmoteFetchResult:
        return dm.parse_bttv(
            get_json_http(f"{self.base_url}/emotes", self.timeout_s)
        )

    def fetch_channel(self, channel: str, broadcaster_id: str | None = None):
        return dm.parse_bttv(
            get_json_http(
                f"{self.base_url}/channels/{_q(channel)}", self.timeout_s
            ),
            channel,
        )


class FFZProvider:
    def __init__(
        self,
        base_url: str = FFZ_API_BASEURL,
        timeout_s: float = DEFAULT_TIMEOUT_S,
    ) -> None:
        self.base_url = base_url
        self.timeout_s = timeout_s

    def fetch_global(self) -> dm.EmoteFetchResult:
        return dm.parse_ffz(
            get_json_http(f"{self.base_url}/set/global", self.timeout_s)
        )

    def fetch_channel(self, channel: str, broadcaster_id: str | None = None):
        return dm.parse_ffz(
            get_json_http(
                f"{self.base_url}/room/{_q(channel)}", self.timeout_s
            ),
            channel,
        )


class SevenTVProvider:
    # SevenTVEmoteProvider.java sends an explicit JSON accept header
    HEADERS = {"Accept": "application/json"}

    def __init__(
        self,
        base_url: str = SEVENTV_API_BASEURL,
        timeout_s: float = DEFAULT_TIMEOUT_S,
    ) -> None:
        self.base_url = base_url
        self.timeout_s = timeout_s

    def fetch_global(self) -> dm.EmoteFetchResult:
        return dm.parse_seventv(
            get_json_http(
                f"{self.base_url}/emotes/global", self.timeout_s, self.HEADERS
            )
        )

    def fetch_channel(self, channel: str, broadcaster_id: str | None = None):
        try:
            payload = get_json_http(
                f"{self.base_url}/users/{_q(channel)}/emotes",
                self.timeout_s,
                self.HEADERS,
            )
        except NotFoundHttpError:
            # channel not registered with SevenTV — not an error
            # (SevenTVEmoteProvider.java:38-41)
            return None
        return dm.parse_seventv(payload, channel)


def reload_emotes(
    providers: list,
    existing,
    channels: dict[str, str | None],
    log=print,
):
    """One maintenance cycle (EmoteExtractor.reloadEmotes): fetch global
    emotes from every provider, then channel emotes for every known
    channel from every provider, and merge everything unseen into
    ``existing`` insert-if-absent. A failed fetch is logged and skipped
    — the cycle must survive a provider outage and retry next time.

    ``channels`` maps channel name -> broadcaster id (None when
    unresolved; only the Twitch provider needs the id). Returns the
    merged dim DataFrame (dim_maintenance.merge_new_emotes).
    """
    fetched: list[dm.EmoteFetchResult] = []
    for p in providers:
        try:
            fetched.append(p.fetch_global())
        except Exception as e:  # noqa: BLE001 — reference logs + continues
            log(f"Could not fetch global emotes from {type(p).__name__}: {e}")
    for channel, broadcaster_id in channels.items():
        for p in providers:
            try:
                r = p.fetch_channel(channel, broadcaster_id)
            except Exception as e:  # noqa: BLE001
                log(
                    f"Could not fetch channel emotes for '{channel}' "
                    f"from {type(p).__name__}: {e}"
                )
                continue
            if r is not None:
                fetched.append(r)
    return dm.merge_new_emotes(existing, fetched)

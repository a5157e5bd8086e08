"""OAuth2 refresh-token client + SQL-like query API client.

Reproduces the reference's QuickBooks connector capabilities
(``quickbooks.py:43-81``): a refresh-token grant that caches a bearer
token, lazy auth on first request, one retry on 401, and a ``query``
method that posts a SQL-like statement to a ``/query`` endpoint returning
a nested payload. Transport and token transport are injectable — tests
run without network; production wires an HTTP callable.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

# (token_url, refresh_token, client_id, client_secret) -> {"access_token": ...}
TokenTransport = Callable[[str, str, str, str], dict[str, Any]]
# (path, params, headers) -> parsed JSON
QueryTransport = Callable[[str, dict[str, Any], dict[str, str]], Any]


class AuthError(RuntimeError):
    """Raised by transports to signal a 401; triggers one token refresh."""


@dataclass
class OAuth2QueryClient:
    token_url: str
    refresh_token: str
    client_id: str
    client_secret: str
    token_transport: TokenTransport
    query_transport: QueryTransport
    minorversion: int = 75
    _access_token: str | None = field(default=None, init=False, repr=False)

    def refresh_access_token(self) -> None:
        """Refresh-token grant (reference ``quickbooks.py:43-59``)."""
        payload = self.token_transport(
            self.token_url, self.refresh_token, self.client_id, self.client_secret
        )
        token = payload.get("access_token")
        if not token:
            raise AuthError("token endpoint returned no access_token")
        self._access_token = token

    def _headers(self) -> dict[str, str]:
        if self._access_token is None:  # lazy auth (quickbooks.py:62-68)
            self.refresh_access_token()
        return {"Authorization": f"Bearer {self._access_token}", "Accept": "application/json"}

    def query(self, statement: str) -> dict:
        """SQL-like query (reference ``quickbooks.py:70-81``), e.g.
        ``select * from Invoice maxresults 1000``; retries once on 401."""
        params = {"query": statement, "minorversion": self.minorversion}
        try:
            return self.query_transport("/query", params, self._headers())
        except AuthError:
            self.refresh_access_token()  # retry-once-on-401 (quickbooks.py:75-78)
            return self.query_transport("/query", params, self._headers())

"""Secret provider — O2 in SURVEY.md §2.11 (reference ``secrets.py:19-43``).

Resolution order reproduces the reference exactly:

1. a configured vault client (Key Vault in the reference; here any
   injected ``Callable[[name], value]`` or mapping — the Azure SDK is not
   assumed to exist in the runtime),
2. else the named environment-variable fallback,
3. else a loud RuntimeError naming both the secret and the fallback.

The vault client is injectable so the provider is testable offline and the
engine stays free of cloud SDK imports; a production deployment passes
``vault_client=lambda name: SecretClient(...).get_secret(name).value``.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Mapping


class SecretProvider:
    """Vault-first secret lookup with environment fallback."""

    def __init__(
        self,
        vault_url: str | None = None,
        vault_client: Callable[[str], str] | Mapping[str, str] | None = None,
        env: Mapping[str, str] | None = None,
    ):
        self.vault_url = vault_url
        if vault_client is not None and not callable(vault_client):
            client_map = dict(vault_client)
            vault_client = client_map.__getitem__
        # a vault URL without an injected client means "no vault reachable
        # from this runtime" — fall through to env, like the reference's
        # local-dev path with AZURE_KEYVAULT_URL unset
        self._client = vault_client
        self._env = env  # None => live os.environ at call time

    def get_secret(self, secret_name: str, env_fallback: str | None = None) -> str:
        if not secret_name:
            raise ValueError("secret_name is required")
        if self._client is not None:
            return self._client(secret_name)
        env = os.environ if self._env is None else self._env
        if env_fallback and env.get(env_fallback):
            return env[env_fallback]
        raise RuntimeError(
            f"no vault client configured and env fallback missing for secret "
            f"'{secret_name}'; configure a vault or set {env_fallback or '<env_fallback>'}"
        )

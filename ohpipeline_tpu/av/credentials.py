"""Credentials: per-service username/password store, encrypted at rest.

Parity target: OpenHome/Av/Credentials.cpp — service credential slots,
RSA keypair generated from device entropy (Credentials.cpp:309-330), the
public key published so control points can send RSA-encrypted passwords,
plaintext never stored; observers notified on change; ProviderCredentials
surfaced the same API over UPnP (here: an ODP service).
"""

from __future__ import annotations

import base64
import threading
from typing import Callable, Optional

from cryptography.hazmat.primitives import hashes, serialization
from cryptography.hazmat.primitives.asymmetric import padding, rsa

from .config import RamStore, StoreKeyNotFound

KEY_BITS = 2048


class Credentials:
    """Service credential registry (ICredentials, Credentials.h:114)."""

    def __init__(self, store: RamStore):
        self._store = store
        self._lock = threading.RLock()
        self._observers: dict[str, list[Callable[[], None]]] = {}
        self._status: dict[str, str] = {}
        self._enabled: dict[str, bool] = {}
        self._key = self._load_or_create_key()

    # -- key management -----------------------------------------------------
    def _load_or_create_key(self) -> rsa.RSAPrivateKey:
        try:
            pem = self._store.read("Credentials.Key")
            return serialization.load_pem_private_key(pem, password=None)
        except (StoreKeyNotFound, ValueError):
            key = rsa.generate_private_key(public_exponent=65537,
                                           key_size=KEY_BITS)
            pem = key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.PKCS8,
                serialization.NoEncryption())
            self._store.write("Credentials.Key", pem)
            return key

    def public_key_pem(self) -> str:
        """Published via GetPublicKey so control points encrypt passwords
        before sending (reference ProviderCredentials)."""
        return self._key.public_key().public_bytes(
            serialization.Encoding.PEM,
            serialization.PublicFormat.SubjectPublicKeyInfo).decode()

    # -- registration (services call this at startup) -----------------------
    def add(self, service_id: str) -> None:
        with self._lock:
            self._observers.setdefault(service_id, [])
            self._enabled.setdefault(service_id, True)
            self._status.setdefault(service_id, "")

    def ids(self) -> list[str]:
        with self._lock:
            return sorted(self._observers)

    def subscribe(self, service_id: str, cb: Callable[[], None]) -> None:
        with self._lock:
            self._observers.setdefault(service_id, []).append(cb)

    # -- credentials --------------------------------------------------------
    def _encrypt(self, plaintext: bytes) -> bytes:
        return self._key.public_key().encrypt(
            plaintext, padding.PKCS1v15())

    def _decrypt(self, blob: bytes) -> bytes:
        return self._key.decrypt(blob, padding.PKCS1v15())

    def set(self, service_id: str, username: str, password: bytes) -> None:
        """`password` may be RSA-encrypted (control-point flow) or raw
        (local flow; it is encrypted before storage either way)."""
        try:
            plain = self._decrypt(password)
        except ValueError:
            plain = password
        with self._lock:
            self._store.write(f"Credentials.{service_id}.Username",
                              username.encode())
            self._store.write(f"Credentials.{service_id}.Password",
                              self._encrypt(plain))
            self._status[service_id] = ""
            obs = list(self._observers.get(service_id, []))
        for cb in obs:
            cb()

    def get(self, service_id: str) -> tuple[str, bytes]:
        """Returns (username, decrypted password)."""
        with self._lock:
            try:
                user = self._store.read(
                    f"Credentials.{service_id}.Username").decode()
                blob = self._store.read(f"Credentials.{service_id}.Password")
            except StoreKeyNotFound:
                return "", b""
        return user, self._decrypt(blob)

    def clear(self, service_id: str) -> None:
        with self._lock:
            self._store.delete(f"Credentials.{service_id}.Username")
            self._store.delete(f"Credentials.{service_id}.Password")
            obs = list(self._observers.get(service_id, []))
        for cb in obs:
            cb()

    # -- status/enabled (reference SetState/GetStatus) -----------------------
    def set_status(self, service_id: str, status: str) -> None:
        with self._lock:
            self._status[service_id] = status

    def status(self, service_id: str) -> str:
        with self._lock:
            return self._status.get(service_id, "")

    def set_enabled(self, service_id: str, enabled: bool) -> None:
        with self._lock:
            self._enabled[service_id] = enabled

    def enabled(self, service_id: str) -> bool:
        with self._lock:
            return self._enabled.get(service_id, True)

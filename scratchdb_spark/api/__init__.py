"""HTTP API surface — the reference's route table
(pkg/api/router.go:48-70) on stdlib http.server:

    GET  /healthcheck
    GET  /share/{uuid}/data.{format}           (public)
    POST /api/data/insert/{table}?flatten=     (auth)
    GET|POST /api/data/query?format=           (auth)
    GET  /api/tables                           (auth)
    GET  /api/tables/{table}/columns           (auth)
    POST /api/data/query/share                 (auth)
    GET  /api/destinations                     (auth)

Auth: ``api_key`` query param -> SHA-256 hash -> destination id
(api/auth.go:23-58); admin key + ``destination_id`` override.
"""

from .app import ScratchAPI, make_server

__all__ = ["ScratchAPI", "make_server"]

"""HTTP webhook ingestion endpoint (reference: webhook graph nodes
receive HTTP POSTs and write them to an output table with a
patterns_request_key for request/response — create.py:177-197,
node.py:544-553).

A small Flask app over GraphRunner.webhook_post: POST /webhooks/<name>
appends the JSON body to the webhook's backing table and (if the
handler node calls respond_to_request) returns the registered JSON
response. Sync mode runs downstream nodes inline so request/response
round-trips in one call; async mode returns 202 with the request key.
"""
from __future__ import annotations

import json
import threading
import time
from typing import Any

from ..graph.runner import GraphRunner


def create_app(runner: GraphRunner, sync: bool = True, response_timeout: float = 10.0):
    from flask import Flask, jsonify, request

    app = Flask("patterns-devkit-spark-webhooks")

    @app.post("/webhooks/<name>")
    def post_webhook(name: str):
        try:
            payload = request.get_json(force=True) or {}
        except Exception:
            return jsonify({"error": "body must be JSON"}), 400
        try:
            key = runner.webhook_post(name, payload)
        except KeyError:
            return jsonify({"error": f"no webhook {name!r}"}), 404
        if sync:
            runner.run_all(include_sources=False)  # event-driven: only nodes downstream of the post
            deadline = time.time() + response_timeout
            while time.time() < deadline:
                resp = runner.engine.get_response(key)
                if resp is not None:
                    return jsonify(resp), 200
                break  # run_all already quiesced; don't spin
        return jsonify({"patterns_request_key": key}), 202

    @app.get("/responses/<request_key>")
    def get_response(request_key: str):
        resp = runner.engine.get_response(request_key)
        if resp is None:
            return jsonify({"status": "pending"}), 404
        return jsonify(resp), 200

    @app.get("/health")
    def health():
        return jsonify({"ok": True, "webhooks": [n.webhook for n in runner.nodes if n.kind == "webhook"]})

    return app


def serve_background(runner: GraphRunner, port: int = 5099, **kwargs: Any):
    """Start the webhook server on a daemon thread; returns (thread,
    base_url). For production put a real WSGI server in front."""
    app = create_app(runner, **kwargs)
    th = threading.Thread(
        target=lambda: app.run(host="127.0.0.1", port=port, debug=False, use_reloader=False),
        daemon=True,
    )
    th.start()
    return th, f"http://127.0.0.1:{port}"

#!/usr/bin/env python
"""Claim the TPU, then run a payload script in-process.

During a pool outage the axon backend init blocks ~25 minutes before
failing UNAVAILABLE.  This wrapper registers the backend itself (with a
short ``claim_timeout_s``, though in the observed outage mode the hang is
upstream of the claim leg, so a down-pool attempt still takes ~25 min),
attempts ONE ``jax.devices()`` claim, and either

- exits with code 3 ("pool still down"), or
- runs the payload script in THIS process — no claim handoff between a
  probe process and the real job, so recovery is used the moment it
  happens.

Usage (note the EMPTY pool-IPs var so sitecustomize skips its own
registration — registration options are process-lifetime):

    PALLAS_AXON_POOL_IPS= PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/tpu_claim_run.py payload.py [payload args...]

Retry loop (space attempts; exit 3 = retry, anything else = done):

    while true; do
      PALLAS_AXON_POOL_IPS= python scripts/tpu_claim_run.py p.py; rc=$?
      [ $rc -ne 3 ] && break; sleep 60
    done
"""
import os
import runpy
import sys
import time
import uuid

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    sys.exit(
        "run with PALLAS_AXON_POOL_IPS= (empty): sitecustomize must not "
        "register the backend first (claim_timeout_s is fixed at first "
        "registration)"
    )

# the env sitecustomize would have set, minus the registration itself
os.environ["PALLAS_AXON_POOL_IPS"] = "127.0.0.1"
os.environ["AXON_POOL_SVC_OVERRIDE"] = "127.0.0.1"
os.environ["AXON_LOOPBACK_RELAY"] = "1"
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
if "/root/.axon_site" not in sys.path:
    sys.path.insert(0, "/root/.axon_site")

from axon.register import register  # noqa: E402

register(
    None,
    f"{os.environ.get('PALLAS_AXON_TPU_GEN', 'v5e')}:1x1x1",
    so_path="/opt/axon/libaxon_pjrt.so",
    session_id=str(uuid.uuid4()),
    remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE", "1") == "1",
    claim_timeout_s=int(os.environ.get("TPU_CLAIM_TIMEOUT_S", "75")),
)

import jax  # noqa: E402

t0 = time.time()
try:
    devs = jax.devices()
except Exception as e:
    print(
        f"[tpu_claim_run] claim failed after {time.time() - t0:.0f}s: "
        f"{str(e).splitlines()[0][:160]}",
        file=sys.stderr,
        flush=True,
    )
    sys.exit(3)
print(
    f"[tpu_claim_run] claimed in {time.time() - t0:.0f}s: {devs}",
    file=sys.stderr,
    flush=True,
)

if len(sys.argv) < 2:
    sys.exit(0)
payload = sys.argv[1]
sys.argv = sys.argv[1:]
runpy.run_path(payload, run_name="__main__")

#!/usr/bin/env bash
# Host real-time tuning for the TPU inspection feeder.
#
# TPU-native rework of the reference's PREEMPT_RT setup
# (scripts/setup-rt-system.sh in lkwik94/heimdall-vision): on a TPU host
# the *device* work is inherently deterministic, so RT tuning applies only
# to the host-side feeder threads (camera NIC interrupt handling, the C++
# ring-buffer producers, and the H2D submission thread).  The goals:
#   - isolate 2-3 cores for feeder threads (native/heimdall_native.cpp
#     pins producers via hn_init_rt)
#   - keep NIC interrupts on the isolated cores
#   - allow SCHED_FIFO for the feeder processes
#   - jumbo frames on camera NICs (GigE Vision, MTU 9000)
#
# Run as root.  Pass --check to only verify the current configuration.

set -euo pipefail

ISOLATED_CPUS="${ISOLATED_CPUS:-1-3}"
CAMERA_IFACE="${CAMERA_IFACE:-}"
CHECK_ONLY=0
[[ "${1:-}" == "--check" ]] && CHECK_ONLY=1

note() { echo "[setup-rt] $*"; }
fail() { echo "[setup-rt] FAIL: $*" >&2; exit 1; }

# ---------------------------------------------------------------------------
note "kernel: $(uname -r)"
if grep -q "isolcpus=" /proc/cmdline; then
    note "isolcpus present: $(tr ' ' '\n' < /proc/cmdline | grep isolcpus)"
else
    note "isolcpus NOT set; add to kernel cmdline for deterministic feeders:"
    note "  isolcpus=${ISOLATED_CPUS} nohz_full=${ISOLATED_CPUS} rcu_nocbs=${ISOLATED_CPUS}"
fi

# ---------------------------------------------------------------------------
# RT scheduling budget: allow SCHED_FIFO to run unthrottled
if [[ $CHECK_ONLY -eq 0 ]]; then
    echo -1 > /proc/sys/kernel/sched_rt_runtime_us 2>/dev/null \
        && note "sched_rt_runtime_us = -1 (FIFO unthrottled)" \
        || note "could not set sched_rt_runtime_us (container?)"
fi
note "sched_rt_runtime_us = $(cat /proc/sys/kernel/sched_rt_runtime_us)"

# ---------------------------------------------------------------------------
# memlock limits for mlockall in the native feeder
if command -v ulimit >/dev/null; then
    note "memlock limit: $(ulimit -l)"
fi

# ---------------------------------------------------------------------------
# camera NIC tuning: jumbo frames + interrupt affinity
if [[ -n "$CAMERA_IFACE" ]]; then
    if [[ $CHECK_ONLY -eq 0 ]]; then
        ip link set dev "$CAMERA_IFACE" mtu 9000 \
            && note "$CAMERA_IFACE MTU 9000" \
            || note "could not set MTU on $CAMERA_IFACE"
        ethtool -G "$CAMERA_IFACE" rx 4096 2>/dev/null || true
    fi
    note "$CAMERA_IFACE: $(ip -o link show "$CAMERA_IFACE" \
        | grep -o 'mtu [0-9]*')"
else
    note "set CAMERA_IFACE=<nic> to tune the camera network interface"
fi

# ---------------------------------------------------------------------------
# scheduling-latency gate (reference gate: cyclictest max < 100 us)
if command -v cyclictest >/dev/null; then
    note "running cyclictest gate (5 threads, prio 99, 10 s)..."
    MAX=$(cyclictest -t5 -p99 -D10 -q | awk '/Max Latencies/ \
        {print $NF}' | tr -d ' ')
    note "cyclictest max latency: ${MAX} us"
    if [[ -n "$MAX" && "$MAX" -lt 100 ]]; then
        note "PASS: max scheduling latency < 100 us"
    else
        note "WARN: latency gate not met (need PREEMPT_RT + isolcpus)"
    fi
else
    note "cyclictest not installed; skipping latency gate"
fi

note "done"

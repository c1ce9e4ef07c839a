"""Modbus/TCP transport: wire-format and integration tests.

The reference only configures modbus (heimdall/core/config.py:50-61); the
transport here must actually speak the protocol, so these tests exchange
real frames with an in-process server and check the reject path end-to-end
through PLCClient/RejectionController.
"""

import struct
import time

import pytest

from heimdall_tpu.runtime.modbus import (ModbusError, ModbusTCPTransport,
                                         SimulatedModbusServer)
from heimdall_tpu.runtime.plc import (PLCClient, RejectionController,
                                      REG_REJECT_PULSE)


@pytest.fixture()
def server():
    srv = SimulatedModbusServer().start()
    yield srv
    srv.stop()


@pytest.fixture()
def transport(server):
    t = ModbusTCPTransport()
    t.connect(server.address[0], server.address[1])
    yield t
    t.disconnect()


def test_write_then_read_single(transport, server):
    transport.write_register(7, 0xBEEF)
    assert server.registers[7] == 0xBEEF
    assert transport.read_register(7) == 0xBEEF


def test_write_multiple_and_bulk_read(transport, server):
    transport.write_registers(10, [1, 2, 3, 65535])
    assert server.registers[10:14] == [1, 2, 3, 65535]
    assert transport.read_registers(10, 4) == [1, 2, 3, 65535]


def test_illegal_address_raises_exception_code(transport):
    with pytest.raises(ModbusError) as e:
        transport.read_registers(5000, 10)
    assert e.value.exception_code == 2   # ILLEGAL DATA ADDRESS


def test_transaction_ids_increment(transport, server):
    for _ in range(3):
        transport.write_register(1, 1)
    assert server.requests_served == 3


def test_count_validation(transport):
    with pytest.raises(ValueError):
        transport.read_registers(0, 126)
    with pytest.raises(ValueError):
        transport.write_registers(0, [])


def test_not_connected_raises():
    t = ModbusTCPTransport()
    with pytest.raises(ConnectionError):
        t.read_register(0)


def test_plc_client_over_modbus(server):
    plc = PLCClient(ip=server.address[0], port=server.address[1],
                    transport=ModbusTCPTransport())
    assert plc.connect()
    plc.write_register(REG_REJECT_PULSE, 1)
    assert server.registers[REG_REJECT_PULSE] == 1
    assert plc.read_register(REG_REJECT_PULSE) == 1
    plc.disconnect()


def test_rejection_pulse_reaches_plc_registers(server):
    plc = PLCClient(ip=server.address[0], port=server.address[1],
                    transport=ModbusTCPTransport())
    plc.connect()
    ctl = RejectionController(plc=plc, delay_ms=10, pulse_duration_ms=5)
    ctl.reject("station_1", confidence=0.9)
    deadline = time.time() + 2.0
    while ctl.rejects_fired < 1 and time.time() < deadline:
        time.sleep(0.005)
    assert ctl.rejects_fired == 1
    # pulse completed: register back to 0, and both writes hit the wire
    assert server.registers[REG_REJECT_PULSE] == 0
    assert ctl.stats()["fired"] == 1


def test_mbap_frame_layout():
    # Golden frame: FC 0x06 write register 100 = 1, txn 1, unit 1
    t = ModbusTCPTransport()

    class Capture:
        def __init__(self):
            self.sent = b""
        def sendall(self, b):
            self.sent = b
            raise ConnectionError("capture only")
        def settimeout(self, *_):
            pass

    t._sock = Capture()
    with pytest.raises(ConnectionError):
        t.write_register(100, 1)
    frame = t._sock.sent
    assert frame == struct.pack(">HHHB", 1, 0, 6, 1) + struct.pack(
        ">BHH", 0x06, 100, 1)

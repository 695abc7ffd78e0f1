"""TensorBoard event-file writer round-trip: parse back our own records and verify the
TFRecord framing (CRC-32C masks) and protobuf fields."""
import struct

from speechless_tpu.utils.tensorboard import SummaryWriter, _masked_crc


def read_records(path):
    data = path.read_bytes()
    offset = 0
    records = []
    while offset < len(data):
        (length,) = struct.unpack_from("<Q", data, offset)
        (length_crc,) = struct.unpack_from("<I", data, offset + 8)
        assert length_crc == _masked_crc(data[offset:offset + 8])
        payload = data[offset + 12: offset + 12 + length]
        (payload_crc,) = struct.unpack_from("<I", data, offset + 12 + length)
        assert payload_crc == _masked_crc(payload)
        records.append(payload)
        offset += 12 + length + 4
    return records


def parse_scalar(event_bytes):
    """Tiny protobuf walk: extract (step, tag, value) from an Event record."""
    i, step, tag, value = 0, None, None, None
    while i < len(event_bytes):
        key = event_bytes[i]
        field, wire = key >> 3, key & 7
        i += 1
        if wire == 1:
            i += 8
        elif wire == 5:
            i += 4
        elif wire == 0:
            v = 0
            shift = 0
            while True:
                b = event_bytes[i]
                v |= (b & 0x7F) << shift
                shift += 7
                i += 1
                if not b & 0x80:
                    break
            if field == 2:
                step = v
        elif wire == 2:
            ln = event_bytes[i]
            i += 1
            sub = event_bytes[i:i + ln]
            if field == 5:  # summary -> value -> (tag, simple_value)
                inner = sub[2: 2 + sub[1]]
                tag_len = inner[1]
                tag = inner[2:2 + tag_len].decode()
                (value,) = struct.unpack("<f", inner[2 + tag_len + 1: 2 + tag_len + 5])
            i += ln
    return step, tag, value


class TestSummaryWriter:
    def test_roundtrip(self, tmp_path):
        with SummaryWriter(tmp_path) as writer:
            writer.add_scalar("loss", 37.19, 1)
            writer.add_scalar("loss", 12.5, 2)
        files = list(tmp_path.glob("events.out.tfevents.*"))
        assert len(files) == 1
        records = read_records(files[0])
        assert len(records) == 3  # file-version header + 2 scalars
        step, tag, value = parse_scalar(records[1])
        assert (step, tag) == (1, "loss")
        assert abs(value - 37.19) < 1e-4
        step2, _, value2 = parse_scalar(records[2])
        assert step2 == 2 and abs(value2 - 12.5) < 1e-4

"""Block-inventory registry tests: coverage and resolvability."""

import pytest

from gr4_packet_modem_tpu import registry


# every block header in the reference inventory (SURVEY.md §2.3) must appear
REFERENCE_HEADERS = [
    "add.hpp", "additive_scrambler.hpp", "binary_slicer.hpp",
    "burst_shaper.hpp", "coarse_frequency_correction.hpp",
    "constellation.hpp", "constellation_llr_decoder.hpp", "costas_loop.hpp",
    "crc.hpp", "crc_append.hpp", "crc_check.hpp", "endianness.hpp",
    "file_sink.hpp", "file_source.hpp", "firdes.hpp", "glfsr_source.hpp",
    "head.hpp", "header_fec_decoder.hpp", "header_fec_encoder.hpp",
    "header_formatter.hpp", "header_parser.hpp", "header_payload_split.hpp",
    "interpolating_fir_filter.hpp", "item_strobe.hpp", "mapper.hpp",
    "message_debug.hpp", "message_debug_stream.hpp", "message_strobe.hpp",
    "multiply_packet_len_tag.hpp", "noise_source.hpp", "null_sink.hpp",
    "null_source.hpp", "pack_bits.hpp", "packet_counter.hpp",
    "packet_ingress.hpp", "packet_limiter.hpp", "packet_mux.hpp",
    "packet_receiver.hpp", "packet_strobe.hpp", "packet_to_stream.hpp",
    "packet_transmitter.hpp", "packet_transmitter_pdu.hpp",
    "packet_transmitter_rrc_taps.hpp", "packet_type.hpp",
    "packet_type_filter.hpp", "payload_metadata_insert.hpp", "pdu.hpp",
    "pdu_to_tagged_stream.hpp", "pfb_arb_resampler.hpp", "pfb_arb_taps.hpp",
    "probe_rate.hpp", "random.hpp", "random_source.hpp", "rotator.hpp",
    "stream_to_pdu.hpp", "stream_to_tagged_stream.hpp", "symbol_filter.hpp",
    "syncword_detection.hpp", "syncword_detection_filter.hpp",
    "syncword_remove.hpp", "syncword_wipeoff.hpp", "tag_gate.hpp",
    "tagged_stream_to_pdu.hpp", "throttle.hpp", "tun.hpp", "tun_sink.hpp",
    "tun_source.hpp", "unpack_bits.hpp", "vector_sink.hpp",
    "vector_source.hpp", "xoroshiro128p.h", "zmq_pdu_pub_sink.hpp",
]


def test_inventory_covers_every_reference_block():
    covered = {e.reference for e in registry.BLOCK_REGISTRY.values()}
    missing = [h for h in REFERENCE_HEADERS if h not in covered]
    assert not missing, f"uncovered reference blocks: {missing}"


def test_resolvable_entries_import():
    failures = []
    for name, entry in registry.BLOCK_REGISTRY.items():
        if entry.kind == "subsumed":
            continue
        try:
            obj = registry.resolve(name)
            assert obj is not None
        except Exception as e:  # noqa: BLE001
            failures.append((name, str(e)))
    assert not failures, failures


def test_subsumed_raises_with_pointer():
    with pytest.raises(KeyError):
        registry.resolve("TagGate")


def test_coverage_stats():
    cov = registry.coverage()
    assert sum(cov.values()) == len(registry.BLOCK_REGISTRY)
    assert cov.get("op", 0) >= 20

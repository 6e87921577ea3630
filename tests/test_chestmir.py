"""ChestMIR two-stage tests: WBF/letterbox geometry, lesion canonicalization,
rerank semantics (fallbacks, ordering), full two-stage eval on synthetic
region data."""
import numpy as np
import pytest

from xmir_tpu.chestmir import (
    build_lesion_map,
    canonical_lesion_name,
    crop_box,
    detections_with_tta_folds,
    evaluate_rankings,
    hflip_boxes,
    letterbox_image,
    letterbox_params,
    nms,
    rerank_with_adaptive_lesion,
    rerank_with_specific_lesion,
    similarity_to_ranks,
    two_stage_eval,
    weighted_boxes_fusion,
    xywh2xyxy,
)


class TestLesionNames:
    def test_aliases(self):
        assert canonical_lesion_name("Nodule/Mass") == "nodule mass"
        assert canonical_lesion_name("effusion") == "pleural effusion"
        assert canonical_lesion_name("Pleural_Thickening") == "pleural thickening"
        assert canonical_lesion_name("unknown thing") == "unknown thing"


class TestGeometry:
    def test_letterbox_params_square(self):
        r, px, py, nh, nw = letterbox_params(640, 640, 640)
        assert r == 1.0 and px == 0 and py == 0

    def test_letterbox_roundtrip(self):
        img = np.zeros((480, 320, 3), np.uint8)
        out, (r, px, py) = letterbox_image(img, 640)
        assert out.shape == (640, 640, 3)
        # scaled height fills the canvas, width is padded
        assert r == pytest.approx(640 / 480)

    def test_xywh2xyxy(self):
        b = np.array([[10.0, 10.0, 4.0, 6.0]])
        np.testing.assert_allclose(xywh2xyxy(b), [[8, 7, 12, 13]])

    def test_hflip_boxes(self):
        b = np.array([[10.0, 5.0, 30.0, 25.0]])
        np.testing.assert_allclose(hflip_boxes(b, 100), [[70, 5, 90, 25]])

    def test_crop_box_clamps(self):
        img = np.arange(100).reshape(10, 10).astype(np.uint8)
        img = np.stack([img] * 3, -1)
        crop = crop_box(img, (-5, -5, 20, 4))
        assert crop.shape == (4, 10, 3)


class TestNMSandWBF:
    def test_nms_suppresses_overlaps(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], float)
        scores = np.array([0.9, 0.8, 0.7])
        keep = nms(boxes, scores, 0.5)
        assert list(keep) == [0, 2]

    def test_wbf_merges_cluster(self):
        b1 = np.array([[0.10, 0.10, 0.30, 0.30]])
        b2 = np.array([[0.12, 0.12, 0.32, 0.32]])
        fb, fs, fl = weighted_boxes_fusion(
            [b1, b2], [np.array([0.8]), np.array([0.6])],
            [np.array([0]), np.array([0])], iou_thr=0.4,
        )
        assert len(fb) == 1
        # confidence-weighted average
        expected = (b1[0] * 0.8 + b2[0] * 0.6) / 1.4
        np.testing.assert_allclose(fb[0], expected, atol=1e-9)
        assert fs[0] == pytest.approx(0.7)  # avg * 2/2 models

    def test_wbf_downweights_single_model_boxes(self):
        b1 = np.array([[0.1, 0.1, 0.3, 0.3]])
        fb, fs, _ = weighted_boxes_fusion(
            [b1, np.zeros((0, 4))], [np.array([0.8]), np.zeros(0)],
            [np.array([0]), np.zeros(0, int)], iou_thr=0.4,
        )
        assert fs[0] == pytest.approx(0.4)  # 0.8 * 1/2 models

    def test_detector_tta_pipeline(self):
        img = np.zeros((480, 320, 3), np.uint8)

        def fake_detector(lb_img):
            # one box around the letterboxed center
            return (np.array([[300.0, 300.0, 340.0, 340.0]]),
                    np.array([0.9]), np.array([0]))

        dets = detections_with_tta_folds(
            img, [fake_detector], img_size=640, score_thres=0.1
        )
        assert len(dets) >= 1
        d = dets[0]
        assert d["class_name"] == "Aortic enlargement"
        assert 0 <= d["x1"] < d["x2"] <= 320
        assert 0 <= d["y1"] < d["y2"] <= 480


def _unit(v):
    return v / np.linalg.norm(v)


class TestRerank:
    def _setup(self, rng):
        # 6 images, 2 classes; globals cluster by class
        centers = np.array([[4.0, 0, 0], [0, 4.0, 0]])
        labels = np.array([0, 0, 0, 1, 1, 1])
        g = centers[labels] + rng.standard_normal((6, 3)) * 0.1
        return g, labels

    def test_build_lesion_map_canonicalizes(self):
        m = build_lesion_map(
            [
                {"label": "Nodule/Mass", "vector": [1.0, 0.0]},
                {"label": "mass", "vector": [0.0, 1.0]},
            ]
        )
        assert list(m) == ["nodule mass"]
        assert len(m["nodule mass"]) == 2
        np.testing.assert_allclose(np.linalg.norm(m["nodule mass"][0]), 1.0)

    def test_fallback_when_query_lacks_lesion(self, rng):
        g, labels = self._setup(rng)
        gn = g / np.linalg.norm(g, axis=1, keepdims=True)
        sim = gn @ gn.T
        maps = [dict() for _ in range(6)]  # nobody has lesions
        ranks, stats = rerank_with_specific_lesion(sim, maps, "cardiomegaly", 5, 0.7)
        np.testing.assert_array_equal(ranks, similarity_to_ranks(sim))
        assert stats["queries_fallback_global"] == 6
        assert stats["queries_reranked"] == 0

    def test_rerank_promotes_lesion_match(self, rng):
        g, labels = self._setup(rng)
        gn = g / np.linalg.norm(g, axis=1, keepdims=True)
        sim = gn @ gn.T
        # query 0 and image 2 share an identical lesion vector; image 1 lacks it
        shared = _unit(np.array([1.0, 2.0, 3.0]))
        maps = [dict() for _ in range(6)]
        maps[0] = {"cardiomegaly": [shared]}
        maps[2] = {"cardiomegaly": [shared]}
        ranks, stats = rerank_with_specific_lesion(
            sim, maps, "cardiomegaly", rerank_topk=5, global_weight=0.1
        )
        # queries 0 and 2 both carry the lesion -> both rerank
        assert stats["queries_reranked"] == 2
        # image 2 (region cos=1) should outrank image 1 (no lesion, score -1)
        order = list(ranks[:, 0])
        assert order.index(2) < order.index(1)

    def test_adaptive_prefers_most_detected(self, rng):
        g, labels = self._setup(rng)
        gn = g / np.linalg.norm(g, axis=1, keepdims=True)
        sim = gn @ gn.T
        v = _unit(np.array([1.0, 0.0, 0.0]))
        maps = [dict() for _ in range(6)]
        maps[0] = {"edema": [v], "cardiomegaly": [v, v, v]}  # cardiomegaly most detected
        maps[1] = {"cardiomegaly": [v]}
        ranks, stats = rerank_with_adaptive_lesion(
            sim, maps, ["edema", "cardiomegaly"], 5, 0.5
        )
        # queries 0 and 1 both have cardiomegaly; query 0 prefers it over
        # edema because it has the most regions
        assert stats["lesion_usage"].get("cardiomegaly", 0) == 2

    def test_two_stage_eval_end_to_end(self, rng):
        g, labels = self._setup(rng)
        shared0 = _unit(rng.standard_normal(4))
        shared1 = _unit(rng.standard_normal(4))
        maps = []
        for i in range(6):
            maps.append(
                {"consolidation": [shared0 if labels[i] == 0 else shared1]}
            )
        out = two_stage_eval(
            g, labels, maps, target_lesions=["consolidation"],
            specific_lesions=["consolidation"], rerank_topk=5, global_weight=0.5,
            kappas=(1, 5),
        )
        assert set(out) == {"stage1_global", "stage2_adaptive", "stage2_consolidation"}
        s1 = out["stage1_global"]["report"]
        assert s1["R@K"][1] == 100.0  # clean clusters
        s2 = out["stage2_consolidation"]["report"]
        assert s2["R@K"][1] >= s1["R@K"][1] - 1e-9  # consistent lesions help
        assert out["stage2_adaptive"]["stats"]["queries_reranked"] == 6


class TestEvaluateRankings:
    def test_metric_suite(self, rng):
        labels = np.array([0, 0, 1, 1])
        e = np.array([[1, 0], [1, 0.01], [0, 1], [0.01, 1]], float)
        en = e / np.linalg.norm(e, axis=1, keepdims=True)
        ranks = similarity_to_ranks(en @ en.T)
        rep = evaluate_rankings(ranks, labels, kappas=(1,), cls_k_values=(1,))
        assert rep["R@K"][1] == 100.0
        assert rep["mAP"] == pytest.approx(100.0)
        assert rep["classification"][1]["accuracy"] == 100.0


class TestDetectionService:
    def test_analyze_image_bytes(self):
        import io
        from PIL import Image
        from xmir_tpu.chestmir import DiseaseDetectionService

        img = np.zeros((120, 160, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")

        def fake_detector(lb):
            return (np.array([[200.0, 200.0, 260.0, 260.0]]),
                    np.array([0.8]), np.array([3]))

        svc = DiseaseDetectionService([fake_detector])
        dets, jpeg = svc.analyze_image(buf.getvalue(), score_thres=0.1)
        # the position-blind fake detector yields a mirrored second box from
        # the hflip TTA pass; both survive WBF as separate clusters
        assert len(dets) == 2
        d = dets[0]
        assert d["class_name_vi"] == "Tim to"  # Cardiomegaly
        assert d["class_name_en"] == "Cardiomegaly"
        assert jpeg[:2] == b"\xff\xd8"  # JPEG magic

    def test_draw_detections(self):
        from xmir_tpu.chestmir import draw_detections

        img = np.zeros((64, 64, 3), np.uint8)
        out = draw_detections(
            img, [{"class_id": 0, "class_name": "X", "confidence": 0.5,
                   "x1": 10, "y1": 10, "x2": 40, "y2": 40}]
        )
        assert out.shape == img.shape
        assert out.sum() > 0  # something drawn


class TestYoloDecode:
    """Raw YOLO output decode + 8-variant TTA (reference
    inference.py:100-273,343-385): golden semantics via mask-oracle
    roundtrips and a content-aware synthetic detector."""

    def test_tta_box_roundtrip_all_8_variants(self):
        from xmir_tpu.chestmir import get_tta_pair

        h, w = 90, 140
        box = (30, 20, 70, 60)
        mask = np.zeros((h, w), np.uint8)
        mask[box[1]:box[3], box[0]:box[2]] = 1
        for ind in range(8):
            image_fn, box_fn = get_tta_pair(ind)
            t = image_fn(mask)
            th, tw = t.shape[:2]
            rows = np.any(t, axis=1).nonzero()[0]
            cols = np.any(t, axis=0).nonzero()[0]
            tbox = (cols[0], rows[0], cols[-1] + 1, rows[-1] + 1)
            back = tuple(box_fn(tbox, th, tw))
            assert back == box, f"TTA {ind}: {back} != {box}"

    def test_nms_class_offsets_and_agnostic(self):
        from xmir_tpu.chestmir import non_max_suppression

        # two near-identical boxes, different argmax classes
        pred = np.array([[
            [50, 50, 20, 20, 0.9, 0.99, 0.01],
            [51, 51, 20, 20, 0.8, 0.01, 0.99],
        ]], np.float32)
        per_class = non_max_suppression(pred, conf_thres=0.1, iou_thres=0.45)[0]
        assert len(per_class) == 2  # different classes never suppress
        agnostic = non_max_suppression(
            pred, conf_thres=0.1, iou_thres=0.45, agnostic=True
        )[0]
        assert len(agnostic) == 1 and agnostic[0, 5] == 0  # higher score wins

    def test_nms_confidence_is_obj_times_cls(self):
        from xmir_tpu.chestmir import non_max_suppression

        pred = np.array([[
            [50, 50, 20, 20, 0.5, 0.9, 0.1],   # conf 0.45
            [120, 120, 20, 20, 0.05, 0.9, 0.1],  # obj below gate
        ]], np.float32)
        out = non_max_suppression(pred, conf_thres=0.46)[0]
        assert len(out) == 0
        out = non_max_suppression(pred, conf_thres=0.4)[0]
        assert len(out) == 1
        assert out[0, 4] == pytest.approx(0.45, abs=1e-6)
        np.testing.assert_allclose(out[0, :4], [40, 40, 60, 60], atol=1e-5)

    def test_nms_max_det(self):
        from xmir_tpu.chestmir import non_max_suppression

        rows = [[10 + 40 * i, 10, 8, 8, 0.9, 1.0] for i in range(10)]
        out = non_max_suppression(
            np.asarray([rows], np.float32), conf_thres=0.1, max_det=4
        )[0]
        assert len(out) == 4

    def test_scale_coords_roundtrip(self):
        from xmir_tpu.chestmir import scale_coords
        from xmir_tpu.chestmir.wbf import letterbox_params

        h, w = 200, 300
        r, px, py, _, _ = letterbox_params(h, w, 640)
        orig = np.array([[60.0, 50.0, 140.0, 120.0]])
        lb = orig.copy()
        lb[:, [0, 2]] = lb[:, [0, 2]] * r + px
        lb[:, [1, 3]] = lb[:, [1, 3]] * r + py
        back = scale_coords(lb, (h, w), r, (px, py))
        np.testing.assert_allclose(back, orig, atol=1e-9)

    def test_predict_image_end_to_end_raw_detector(self):
        """A content-aware fixture detector emits raw YOLO rows for the
        bright rectangle it sees; over 2 folds x 8 TTA the decoded, reversed
        and WBF-fused result must localize the original rectangle."""
        from xmir_tpu.chestmir import predict_image

        h, w = 200, 300
        rect = (60, 50, 140, 120)  # x1 y1 x2 y2
        image = np.zeros((h, w, 3), np.uint8)
        image[rect[1]:rect[3], rect[0]:rect[2]] = 255

        def detector(input_tensor):
            img = input_tensor[0].transpose(1, 2, 0) * 255.0
            m = img[..., 0] > 200
            ys, xs = np.nonzero(m)
            n_cls = 3
            if len(xs) == 0:
                return np.zeros((1, 1, 5 + n_cls), np.float32)
            x1, x2 = xs.min(), xs.max() + 1
            y1, y2 = ys.min(), ys.max() + 1
            row = [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1, 0.9,
                   0.01, 0.99, 0.01]
            return np.asarray([[row]], np.float32)

        res = predict_image(
            image, [detector, detector], tta=range(8), img_size=128,
            score_thres=0.1, class_names=["a", "b", "c"],
        )
        dets = res["detections"]
        assert len(dets) == 1
        d = dets[0]
        assert d["class_id"] == 1 and d["class_name"] == "b"
        assert d["confidence"] == pytest.approx(0.9 * 0.99, abs=0.01)
        got = (d["x1"], d["y1"], d["x2"], d["y2"])
        for g, e in zip(got, rect):
            assert abs(g - e) <= 4, (got, rect)

    def test_detections_with_tta_folds_raw_path(self):
        from xmir_tpu.chestmir import detections_with_tta_folds

        image = np.zeros((100, 100, 3), np.uint8)
        image[30:60, 20:70] = 255

        def detector(input_tensor):
            img = input_tensor[0].transpose(1, 2, 0) * 255.0
            ys, xs = np.nonzero(img[..., 0] > 200)
            if len(xs) == 0:
                return np.zeros((1, 1, 7), np.float32)
            x1, x2, y1, y2 = xs.min(), xs.max() + 1, ys.min(), ys.max() + 1
            return np.asarray(
                [[[(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1, 0.9, 0.9, 0.1]]],
                np.float32,
            )

        dets = detections_with_tta_folds(
            image, [detector], raw_outputs=True, tta=(0, 1, 4),
            img_size=64, class_names=["x", "y"],
        )
        assert len(dets) == 1 and dets[0]["class_name"] == "x"
        assert abs(dets[0]["x1"] - 20) <= 4 and abs(dets[0]["y2"] - 60) <= 4


class TestRerankVectorizedOracle:
    """The batched region scoring (one matmul + segment-max,
    _region_score_rows) must reproduce the reference-shaped per-candidate
    loop (_rerank_one_query) exactly on randomized lesion maps."""

    def _random_maps(self, rng, n, d=8, lesions=("cardiomegaly", "nodule")):
        from xmir_tpu.chestmir.two_stage import build_lesion_map

        maps = []
        for _ in range(n):
            regions = []
            for name in lesions:
                for _ in range(int(rng.integers(0, 3))):
                    regions.append(
                        {"label": name, "vector": rng.standard_normal(d)}
                    )
            maps.append(build_lesion_map(regions))
        return maps

    @pytest.mark.parametrize("mode", ["specific", "adaptive"])
    def test_matches_per_query_loop(self, rng, mode):
        from xmir_tpu.chestmir.two_stage import (
            _rerank_one_query,
            choose_query_adaptive_lesion_vector,
            choose_query_lesion_vector,
            rerank_with_adaptive_lesion,
            rerank_with_specific_lesion,
            similarity_to_ranks,
        )

        n = 24
        maps = self._random_maps(rng, n)
        e = rng.standard_normal((n, 8))
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        sim = e @ e.T
        if mode == "specific":
            got, stats = rerank_with_specific_lesion(
                sim, maps, "cardiomegaly", rerank_topk=7, global_weight=0.6
            )
        else:
            got, stats = rerank_with_adaptive_lesion(
                sim, maps, ["cardiomegaly", "nodule"], rerank_topk=7,
                global_weight=0.6,
            )
        ranks_base = similarity_to_ranks(sim)
        reranked = 0
        for i in range(n):
            if mode == "specific":
                lesion = "cardiomegaly"
                q_vec = choose_query_lesion_vector(maps[i], lesion)
            else:
                lesion, q_vec = choose_query_adaptive_lesion_vector(
                    maps[i], ["cardiomegaly", "nodule"]
                )
            if q_vec is None:
                np.testing.assert_array_equal(got[:, i], ranks_base[:, i])
                continue
            want, matched, _ = _rerank_one_query(
                i, sim, ranks_base[:, i], maps, q_vec, lesion, 7, 0.6
            )
            if want is None:
                np.testing.assert_array_equal(got[:, i], ranks_base[:, i])
            else:
                reranked += 1
                np.testing.assert_array_equal(got[:, i], want)
        assert stats["queries_reranked"] == reranked > 0

"""Face-restoration helper: align faces to the FFHQ 5-landmark template,
crop, and paste restored faces back with soft-mask blending.

Parity target: ``basicsr/utils/face_util.py:16-217`` (BasicSR
inheritance; unused by every REFID pipeline — kept for capability
parity).  Differences by design:

* the similarity transform is estimated with a numpy Umeyama solver
  (``estimate_similarity``) instead of skimage's SimilarityTransform —
  same least-squares alignment, no skimage dependency;
* dlib (absent in this image) is imported lazily; construction and the
  geometry path work without it, only ``init_dlib``/``detect_faces``
  raise a clear ImportError;
* inverse affines save as ``.npy`` instead of torch ``.pth``.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["estimate_similarity", "FaceRestorationHelper"]


def estimate_similarity(src, dst):
    """Least-squares similarity transform (Umeyama 1991): returns the
    2x3 affine matrix M with ``dst ~= src @ M[:, :2].T + M[:, 2]``.

    Drop-in for skimage ``SimilarityTransform.estimate(...).params[:2]``
    as used by the reference (face_util.py:140-142)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    assert src.shape == dst.shape and src.ndim == 2 and src.shape[1] == 2
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / src.shape[0]
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U) * np.linalg.det(Vt))
    D = np.diag([1.0, d])
    R = U @ D @ Vt
    var_s = (sc ** 2).sum() / src.shape[0]
    scale = np.trace(np.diag(S) @ D) / var_s
    t = mu_d - scale * (R @ mu_s)
    M = np.empty((2, 3), np.float64)
    M[:, :2] = scale * R
    M[:, 2] = t
    return M


class FaceRestorationHelper:
    """Reference face_util.py:16-217 workflow: detect (dlib, optional) ->
    5-landmark similarity alignment to the FFHQ template -> crop ->
    restore (caller) -> inverse-warp + soft-mask paste."""

    def __init__(self, upscale_factor, face_size=512):
        self.upscale_factor = upscale_factor
        self.face_size = (face_size, face_size)
        # standard 5 landmarks for FFHQ faces at 1024x1024
        # (face_util.py:24-28), scaled to face_size
        self.face_template = np.array(
            [[686.77227723, 488.62376238],
             [586.77227723, 493.59405941],
             [337.91089109, 488.38613861],
             [437.95049505, 493.51485149],
             [513.58415842, 678.5049505]]) / (1024 // face_size)
        self.all_landmarks_5 = []
        self.all_landmarks_68 = []
        self.affine_matrices = []
        self.inverse_affine_matrices = []
        self.cropped_faces = []
        self.restored_faces = []
        self.input_img = None
        self.save_png = True

    # -- detection (dlib-gated) -----------------------------------------
    def init_dlib(self, detection_path, landmark5_path, landmark68_path):
        try:
            import dlib
        except ImportError as e:
            raise ImportError(
                "FaceRestorationHelper detection needs dlib, which is not "
                "installed in this image; the alignment/paste geometry "
                "works without it (supply landmarks directly)") from e
        self.face_detector = dlib.cnn_face_detection_model_v1(detection_path)
        self.shape_predictor_5 = dlib.shape_predictor(landmark5_path)
        self.shape_predictor_68 = dlib.shape_predictor(landmark68_path)

    def read_input_image(self, img_path):
        import cv2
        # self.input_img is RGB like the reference (face_util.py:52-54)
        self.input_img = cv2.cvtColor(cv2.imread(str(img_path)),
                                      cv2.COLOR_BGR2RGB)

    def detect_faces(self, img_path, upsample_num_times=1):
        """dlib CNN detection + 5-point landmarks (face_util.py:56-94)."""
        if not hasattr(self, "face_detector"):
            raise RuntimeError("call init_dlib() first")
        self.read_input_image(img_path)
        det_faces = self.face_detector(self.input_img, upsample_num_times)
        for det in det_faces:
            shape = self.shape_predictor_5(self.input_img, det.rect)
            self.all_landmarks_5.append(
                np.array([[p.x, p.y] for p in shape.parts()]))
        return len(det_faces)

    # -- geometry (dependency-free) -------------------------------------
    def warp_crop_faces(self, save_cropped_path=None,
                        save_inverse_affine_path=None):
        """Affine per face from its 5 landmarks; crop to face_size; also
        the inverse affine at upscale resolution (face_util.py:132-168)."""
        import cv2
        for idx, landmark in enumerate(self.all_landmarks_5):
            affine = estimate_similarity(landmark, self.face_template)
            self.affine_matrices.append(affine)
            self.cropped_faces.append(
                cv2.warpAffine(self.input_img, affine, self.face_size))
            if save_cropped_path is not None:
                path, ext = os.path.splitext(str(save_cropped_path))
                ext = ".png" if self.save_png else ext
                cv2.imwrite(f"{path}_{idx:02d}{ext}",
                            cv2.cvtColor(self.cropped_faces[-1],
                                         cv2.COLOR_RGB2BGR))
            inverse = estimate_similarity(
                self.face_template, landmark * self.upscale_factor)
            self.inverse_affine_matrices.append(inverse)
            if save_inverse_affine_path is not None:
                path, _ = os.path.splitext(str(save_inverse_affine_path))
                np.save(f"{path}_{idx:02d}.npy", inverse)

    def add_restored_face(self, face):
        self.restored_faces.append(face)

    def paste_faces_to_input_image(self, save_path=None, upsample_img=None):
        """Inverse-warp each restored face onto the (resized) input and
        blend with an eroded + blurred soft mask (face_util.py:173-209).
        Returns the composited uint8 BGR image; saves it if save_path."""
        import cv2
        input_img = cv2.cvtColor(self.input_img, cv2.COLOR_RGB2BGR)
        h, w, _ = input_img.shape
        h_up, w_up = h * self.upscale_factor, w * self.upscale_factor
        if upsample_img is None:
            upsample_img = cv2.resize(input_img, (w_up, h_up))
        upsample_img = upsample_img.astype(np.float32)
        assert len(self.restored_faces) == len(self.inverse_affine_matrices)
        for face, inverse in zip(self.restored_faces,
                                 self.inverse_affine_matrices):
            inv_restored = cv2.warpAffine(face, inverse, (w_up, h_up))
            mask = np.ones((*self.face_size, 3), np.float32)
            inv_mask = cv2.warpAffine(mask, inverse, (w_up, h_up))
            k = 2 * self.upscale_factor
            inv_mask_erosion = cv2.erode(inv_mask, np.ones((k, k), np.uint8))
            inv_face = inv_mask_erosion * inv_restored
            total_face_area = np.sum(inv_mask_erosion) // 3
            w_edge = int(total_face_area ** 0.5) // 20
            if w_edge > 0:
                r = w_edge * 2
                inv_mask_center = cv2.erode(inv_mask_erosion,
                                            np.ones((r, r), np.uint8))
                inv_soft_mask = cv2.GaussianBlur(inv_mask_center,
                                                 (r + 1, r + 1), 0)
            else:
                inv_soft_mask = inv_mask_erosion
            upsample_img = (inv_soft_mask * inv_face
                            + (1 - inv_soft_mask) * upsample_img)
        out = upsample_img.astype(np.uint8)
        if save_path is not None:
            save_path = str(save_path)
            if self.save_png:
                save_path = save_path.replace(".jpg", ".png").replace(
                    ".jpeg", ".png")
            cv2.imwrite(save_path, out)
        return out

    def clean_all(self):
        self.all_landmarks_5 = []
        self.all_landmarks_68 = []
        self.restored_faces = []
        self.affine_matrices = []
        self.cropped_faces = []
        self.inverse_affine_matrices = []

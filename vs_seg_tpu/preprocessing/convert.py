"""DICOM -> NIFTI conversion toolchain (no 3D Slicer, no pydicom).

Replaces the reference offline preprocessing (SURVEY.md §3.5):
  - series assembly + LPS->RAS affine (reference data_conversion.py
    import_T1_and_T2_data:101-184 via Slicer DICOM import)
  - planar-contour rasterization to labelmaps (reference
    data_conversion.py:242-344 via SlicerRT; here: scanline polygon fill on
    the acquisition grid)
  - TCIA folder restructure (reference
    TCIA_data_convert_into_convenient_folder_structure.py)
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from vs_seg_tpu.data import nifti
from vs_seg_tpu.preprocessing.dicom import DicomDataset, pixel_array, read_dicom


def load_series(paths: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
    """Assemble image slices into a volume + RAS affine.

    Returns (volume (rows, cols, slices) float32, affine 4x4 RAS).
    Slices sorted by projection of ImagePositionPatient onto the slice normal.
    """
    slices = []
    for p in paths:
        ds = read_dicom(p)
        if "PixelData" not in ds:
            continue
        slices.append(ds)
    if not slices:
        raise ValueError("no image slices found")
    iop = np.asarray(slices[0]["ImageOrientationPatient"], dtype=np.float64)
    row_dir, col_dir = iop[:3], iop[3:]          # X: along columns; Y: along rows
    normal = np.cross(row_dir, col_dir)
    slices.sort(key=lambda ds: float(
        np.dot(np.asarray(ds["ImagePositionPatient"]), normal)))

    vols = []
    for ds in slices:
        arr = pixel_array(ds).astype(np.float32)
        slope = float(ds.get("RescaleSlope", 1.0) or 1.0)
        inter = float(ds.get("RescaleIntercept", 0.0) or 0.0)
        vols.append(arr * slope + inter)
    volume = np.stack(vols, axis=-1)  # (rows, cols, slices)

    ipp0 = np.asarray(slices[0]["ImagePositionPatient"], dtype=np.float64)
    spacing = np.asarray(slices[0]["PixelSpacing"], dtype=np.float64)  # (row, col)
    if len(slices) > 1:
        step = (np.asarray(slices[1]["ImagePositionPatient"]) - ipp0)
    else:
        step = normal * float(slices[0].get("SliceThickness", 1.0) or 1.0)

    # LPS affine: world = IPP + col_dir*rowspacing*r + row_dir*colspacing*c + step*k
    affine_lps = np.eye(4)
    affine_lps[:3, 0] = col_dir * spacing[0]
    affine_lps[:3, 1] = row_dir * spacing[1]
    affine_lps[:3, 2] = step
    affine_lps[:3, 3] = ipp0
    # LPS -> RAS: negate x and y world axes
    flip = np.diag([-1.0, -1.0, 1.0, 1.0])
    return volume, flip @ affine_lps


def _fill_polygon(mask_2d: np.ndarray, poly_rc: np.ndarray) -> None:
    """XOR scanline fill of a closed polygon given in (row, col) float coords.

    XOR accumulation reproduces planar-contour semantics for nested contours
    (holes), matching SlicerRT's even-odd rasterization.
    """
    rows, cols = mask_2d.shape
    r = poly_rc[:, 0]
    c = poly_rc[:, 1]
    n = len(poly_rc)
    for row in range(int(np.floor(r.min())), int(np.ceil(r.max())) + 1):
        if row < 0 or row >= rows:
            continue
        xs = []
        y = row
        for i in range(n):
            y1, x1 = r[i], c[i]
            y2, x2 = r[(i + 1) % n], c[(i + 1) % n]
            if (y1 <= y < y2) or (y2 <= y < y1):
                t = (y - y1) / (y2 - y1)
                xs.append(x1 + t * (x2 - x1))
        xs.sort()
        for k in range(0, len(xs) - 1, 2):
            lo = int(np.ceil(xs[k] - 0.5))
            hi = int(np.floor(xs[k + 1] - 0.5))
            lo = max(lo, 0)
            hi = min(hi, cols - 1)
            if hi >= lo:
                mask_2d[row, lo:hi + 1] ^= True


def rasterize_contours(contours_lps: List[np.ndarray], affine_ras: np.ndarray,
                       shape: Tuple[int, int, int]) -> np.ndarray:
    """Rasterize planar contours (world LPS points, (N,3) each) to a labelmap
    on the image grid defined by the RAS affine + shape."""
    inv = np.linalg.inv(affine_ras)
    flip = np.diag([-1.0, -1.0, 1.0, 1.0])
    labelmap = np.zeros(shape, dtype=bool)
    for pts in contours_lps:
        pts = np.asarray(pts, dtype=np.float64).reshape(-1, 3)
        ras = (flip[:3, :3] @ pts.T).T  # LPS -> RAS world
        hom = np.concatenate([ras, np.ones((len(ras), 1))], axis=1)
        vox = (inv @ hom.T).T[:, :3]
        k = int(round(float(np.median(vox[:, 2]))))
        if k < 0 or k >= shape[2]:
            continue
        _fill_polygon(labelmap[:, :, k], vox[:, [0, 1]])
    return labelmap.astype(np.uint8)


def extract_rtstruct_contours(ds: DicomDataset,
                              roi_name_pattern: str = r".*"
                              ) -> List[np.ndarray]:
    """All ContourData point lists (LPS mm) for ROIs matching the pattern."""
    roi_names = {}
    for item in ds.get("StructureSetROISequence", []):
        roi_names[str(item.get("ROINumber"))] = item.get("ROIName", "")
    contours = []
    pattern = re.compile(roi_name_pattern, re.IGNORECASE)
    for roi in ds.get("ROIContourSequence", []):
        number = str(roi.get("ReferencedROINumber"))
        if not pattern.match(str(roi_names.get(number, ""))):
            continue
        for c in roi.get("ContourSequence", []):
            data = c.get("ContourData")
            if data is None:
                continue
            contours.append(np.asarray(data, dtype=np.float64).reshape(-1, 3))
    return contours


def load_contours_json(path: str) -> List[np.ndarray]:
    """contours.json (reference data_conversion.py:217-240): LPS point lists."""
    with open(path) as f:
        payload = json.load(f)
    out = []

    def walk(node):
        if isinstance(node, dict):
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            if node and isinstance(node[0], (int, float)) and len(node) % 3 == 0:
                out.append(np.asarray(node, dtype=np.float64).reshape(-1, 3))
            else:
                for v in node:
                    walk(v)

    walk(payload)
    return out


def restructure_tcia(input_root: str, output_root: str) -> List[str]:
    """Reorganize TCIA VS-SEG-* downloads into vs_gk_<n>_{t1,t2}/ folders
    (reference TCIA_data_convert_into_convenient_folder_structure.py).

    Classifies series by Modality, pairs each RTSTRUCT with its referenced
    image series via FrameOfReference/SeriesInstanceUID, and copies files.
    """
    created = []
    case_dirs = sorted(
        (d for d in os.listdir(input_root) if d.startswith("VS-SEG-")),
        key=lambda s: int(re.sub(r"\D", "", s) or 0))
    for case_dir in case_dirs:
        case_num = int(re.sub(r"\D", "", case_dir))
        series: Dict[str, dict] = {}
        rtss = []
        for dirpath, _, files in os.walk(os.path.join(input_root, case_dir)):
            for fname in files:
                if not fname.lower().endswith(".dcm"):
                    continue
                path = os.path.join(dirpath, fname)
                try:
                    ds = read_dicom(path, headers_only=True)
                except Exception:
                    continue
                modality = str(ds.get("Modality", ""))
                if modality == "MR":
                    uid = str(ds.get("SeriesInstanceUID"))
                    series.setdefault(uid, {"files": [], "desc": str(
                        ds.get("SeriesDescription", "")).lower()})
                    series[uid]["files"].append(path)
                elif modality == "RTSTRUCT":
                    rtss.append((path, ds))
        for uid, info in series.items():
            if "t1" in info["desc"]:
                tag = "t1"
            elif "t2" in info["desc"]:
                tag = "t2"
            else:
                continue
            dest = os.path.join(output_root, f"vs_gk_{case_num}_{tag}")
            os.makedirs(dest, exist_ok=True)
            for i, f in enumerate(sorted(info["files"])):
                shutil.copy(f, os.path.join(dest, f"IMG{i:04d}.dcm"))
            # pair RTSTRUCT referencing this series: exact-match against the
            # SET of UIDs referenced anywhere in the RTSS (incl. the nested
            # RT Referenced Study/Series sequences). Substring matching on a
            # serialized dump was prefix-unsafe ('...1.1' matches '...1.10').
            for path, ds in rtss:
                if uid in _collect_uids(ds):
                    shutil.copy(path, os.path.join(dest, "RTSS.dcm"))
            created.append(dest)
    return created


def _collect_uids(node) -> set:
    uids = set()
    if isinstance(node, dict):
        for k, v in node.items():
            if k.endswith("UID") and isinstance(v, str):
                uids.add(v)
            else:
                uids |= _collect_uids(v)
    elif isinstance(node, list):
        for v in node:
            uids |= _collect_uids(v)
    return uids


def convert_case(case_dir: str, output_dir: str, dataset: str = "T1",
                 roi_pattern: str = r".*(vs|tv|tumor|schwannoma).*") -> Dict[str, str]:
    """DICOM case folder (IMG*.dcm + RTSS.dcm) -> reference NIFTI layout:
    vs_gk_<tag>_ref<DS>.nii.gz + vs_gk_seg_ref<DS>.nii.gz."""
    tag = dataset.lower()
    img_files = sorted(
        os.path.join(case_dir, f) for f in os.listdir(case_dir)
        if f.startswith("IMG") and f.endswith(".dcm"))
    volume, affine = load_series(img_files)
    os.makedirs(output_dir, exist_ok=True)
    out = {}
    img_path = os.path.join(output_dir, f"vs_gk_{tag}_ref{dataset}.nii.gz")
    nifti.save(nifti.NiftiImage(volume.astype(np.float32), affine), img_path)
    out["image"] = img_path

    rtss_path = os.path.join(case_dir, "RTSS.dcm")
    contours_json = os.path.join(case_dir, "contours.json")
    contours = None
    if os.path.exists(rtss_path):
        contours = extract_rtstruct_contours(read_dicom(rtss_path), roi_pattern)
    elif os.path.exists(contours_json):
        contours = load_contours_json(contours_json)
    if contours:
        seg = rasterize_contours(contours, affine, volume.shape)
        seg_path = os.path.join(output_dir, f"vs_gk_seg_ref{dataset}.nii.gz")
        nifti.save(nifti.NiftiImage(seg, affine), seg_path)
        out["label"] = seg_path
    return out

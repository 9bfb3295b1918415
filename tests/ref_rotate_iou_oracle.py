"""Plain-Python transcription of the reference's numba.cuda rotated-IoU
kernel (GMW/evaluation/kitti_object_eval_python/rotate_iou.py:18-332).

Mechanical un-CUDA-ing for the metric-1/2 bit-check (VERDICT r3 item #3):
``cuda.local.array`` becomes a NumPy array, device functions become plain
functions, the block/thread launch becomes two loops. Every arithmetic op
stays np.float32 in the reference's op order (fastmath=False), so this is
the ground truth that dcd_tpu.evaluation.rotate_iou must match bitwise.
(Trig: np.cos/np.sin on float32 stand in for CUDA cosf/sinf — may differ
from the GPU by 1 ulp; both sides of the test use the same.)
"""

import numpy as np

F = np.float32


def trangle_area(a, b, c):
    return ((a[0] - c[0]) * (b[1] - c[1]) - (a[1] - c[1]) * (b[0] - c[0])) / F(2.0)


def area(int_pts, num_of_inter):
    area_val = F(0.0)
    for i in range(num_of_inter - 2):
        area_val = area_val + abs(
            trangle_area(int_pts[:2], int_pts[2 * i + 2:2 * i + 4],
                         int_pts[2 * i + 4:2 * i + 6]))
    return area_val


def sort_vertex_in_convex_polygon(int_pts, num_of_inter):
    if num_of_inter > 0:
        center = np.zeros((2,), dtype=F)
        for i in range(num_of_inter):
            center[0] += int_pts[2 * i]
            center[1] += int_pts[2 * i + 1]
        center[0] /= F(num_of_inter)
        center[1] /= F(num_of_inter)
        v = np.zeros((2,), dtype=F)
        vs = np.zeros((16,), dtype=F)
        with np.errstate(divide="ignore", invalid="ignore"):
            for i in range(num_of_inter):
                v[0] = int_pts[2 * i] - center[0]
                v[1] = int_pts[2 * i + 1] - center[1]
                d = np.sqrt(v[0] * v[0] + v[1] * v[1])
                v[0] = v[0] / d
                v[1] = v[1] / d
                if v[1] < 0:
                    v[0] = F(-2.0) - v[0]
                vs[i] = v[0]
        for i in range(1, num_of_inter):
            if vs[i - 1] > vs[i]:
                temp = vs[i]
                tx = int_pts[2 * i]
                ty = int_pts[2 * i + 1]
                j = i
                while j > 0 and vs[j - 1] > temp:
                    vs[j] = vs[j - 1]
                    int_pts[j * 2] = int_pts[j * 2 - 2]
                    int_pts[j * 2 + 1] = int_pts[j * 2 - 1]
                    j -= 1
                vs[j] = temp
                int_pts[j * 2] = tx
                int_pts[j * 2 + 1] = ty


def line_segment_intersection(pts1, pts2, i, j, temp_pts):
    A = np.zeros((2,), dtype=F)
    B = np.zeros((2,), dtype=F)
    C = np.zeros((2,), dtype=F)
    D = np.zeros((2,), dtype=F)

    A[0] = pts1[2 * i]
    A[1] = pts1[2 * i + 1]
    B[0] = pts1[2 * ((i + 1) % 4)]
    B[1] = pts1[2 * ((i + 1) % 4) + 1]
    C[0] = pts2[2 * j]
    C[1] = pts2[2 * j + 1]
    D[0] = pts2[2 * ((j + 1) % 4)]
    D[1] = pts2[2 * ((j + 1) % 4) + 1]
    BA0 = B[0] - A[0]
    BA1 = B[1] - A[1]
    DA0 = D[0] - A[0]
    CA0 = C[0] - A[0]
    DA1 = D[1] - A[1]
    CA1 = C[1] - A[1]
    acd = DA1 * CA0 > CA1 * DA0
    bcd = (D[1] - B[1]) * (C[0] - B[0]) > (C[1] - B[1]) * (D[0] - B[0])
    if acd != bcd:
        abc = CA1 * BA0 > BA1 * CA0
        abd = DA1 * BA0 > BA1 * DA0
        if abc != abd:
            DC0 = D[0] - C[0]
            DC1 = D[1] - C[1]
            ABBA = A[0] * B[1] - B[0] * A[1]
            CDDC = C[0] * D[1] - D[0] * C[1]
            DH = BA1 * DC0 - BA0 * DC1
            Dx = ABBA * DC0 - BA0 * CDDC
            Dy = ABBA * DC1 - BA1 * CDDC
            temp_pts[0] = Dx / DH
            temp_pts[1] = Dy / DH
            return True
    return False


def point_in_quadrilateral(pt_x, pt_y, corners):
    ab0 = corners[2] - corners[0]
    ab1 = corners[3] - corners[1]
    ad0 = corners[6] - corners[0]
    ad1 = corners[7] - corners[1]
    ap0 = pt_x - corners[0]
    ap1 = pt_y - corners[1]
    abab = ab0 * ab0 + ab1 * ab1
    abap = ab0 * ap0 + ab1 * ap1
    adad = ad0 * ad0 + ad1 * ad1
    adap = ad0 * ap0 + ad1 * ap1
    return abab >= abap and abap >= 0 and adad >= adap and adap >= 0


def quadrilateral_intersection(pts1, pts2, int_pts):
    num_of_inter = 0
    for i in range(4):
        if point_in_quadrilateral(pts1[2 * i], pts1[2 * i + 1], pts2):
            int_pts[num_of_inter * 2] = pts1[2 * i]
            int_pts[num_of_inter * 2 + 1] = pts1[2 * i + 1]
            num_of_inter += 1
        if point_in_quadrilateral(pts2[2 * i], pts2[2 * i + 1], pts1):
            int_pts[num_of_inter * 2] = pts2[2 * i]
            int_pts[num_of_inter * 2 + 1] = pts2[2 * i + 1]
            num_of_inter += 1
    temp_pts = np.zeros((2,), dtype=F)
    for i in range(4):
        for j in range(4):
            has_pts = line_segment_intersection(pts1, pts2, i, j, temp_pts)
            if has_pts:
                int_pts[num_of_inter * 2] = temp_pts[0]
                int_pts[num_of_inter * 2 + 1] = temp_pts[1]
                num_of_inter += 1
    return num_of_inter


def rbbox_to_corners(corners, rbbox):
    angle = rbbox[4]
    a_cos = np.cos(angle)
    a_sin = np.sin(angle)
    center_x = rbbox[0]
    center_y = rbbox[1]
    x_d = rbbox[2]
    y_d = rbbox[3]
    corners_x = np.zeros((4,), dtype=F)
    corners_y = np.zeros((4,), dtype=F)
    corners_x[0] = -x_d / F(2.0)
    corners_x[1] = -x_d / F(2.0)
    corners_x[2] = x_d / F(2.0)
    corners_x[3] = x_d / F(2.0)
    corners_y[0] = -y_d / F(2.0)
    corners_y[1] = y_d / F(2.0)
    corners_y[2] = y_d / F(2.0)
    corners_y[3] = -y_d / F(2.0)
    for i in range(4):
        corners[2 * i] = a_cos * corners_x[i] + a_sin * corners_y[i] + center_x
        corners[2 * i + 1] = -a_sin * corners_x[i] + a_cos * corners_y[i] + center_y


def inter(rbbox1, rbbox2):
    corners1 = np.zeros((8,), dtype=F)
    corners2 = np.zeros((8,), dtype=F)
    # 24-slot buffer (the CUDA kernel declares 16 floats = 8 points; valid
    # geometry never exceeds 8, the extra slots only guard the transcription
    # against out-of-bounds writes on malformed input)
    intersection_corners = np.zeros((48,), dtype=F)
    rbbox_to_corners(corners1, rbbox1)
    rbbox_to_corners(corners2, rbbox2)
    num_intersection = quadrilateral_intersection(corners1, corners2,
                                                  intersection_corners)
    sort_vertex_in_convex_polygon(intersection_corners, num_intersection)
    return area(intersection_corners, num_intersection)


def devRotateIoUEval(rbox1, rbox2, criterion=-1):
    area1 = rbox1[2] * rbox1[3]
    area2 = rbox2[2] * rbox2[3]
    with np.errstate(divide="ignore", invalid="ignore"):
        area_inter = inter(rbox1, rbox2)
        if criterion == -1:
            return area_inter / (area1 + area2 - area_inter)
        elif criterion == 0:
            return area_inter / area1
        elif criterion == 1:
            return area_inter / area2
        else:
            return area_inter


def rotate_iou_gpu_eval(boxes, query_boxes, criterion=-1, device_id=0):
    """The launcher (reference :266-332) without the CUDA grid: the kernel
    computes dev_iou[box, query] = devRotateIoUEval(qbox, box)."""
    box_dtype = boxes.dtype
    boxes = boxes.astype(np.float32)
    query_boxes = query_boxes.astype(np.float32)
    N = boxes.shape[0]
    K = query_boxes.shape[0]
    iou = np.zeros((N, K), dtype=np.float32)
    if N == 0 or K == 0:
        return iou.astype(box_dtype)
    for n in range(N):
        for k in range(K):
            iou[n, k] = devRotateIoUEval(query_boxes[k], boxes[n], criterion)
    return iou.astype(box_dtype)

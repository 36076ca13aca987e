// Native topology builder: URDF parsing + robot-graph preprocessing in C++.
//
// The reference framework's native tier is its generated CUDA header; this
// framework's compute tier is Pallas/XLA, and the *runtime* native tier is
// this library: it parses URDF XML and bakes the full static topology
// (parents, S indices, tree transforms, lumped spatial inertias, limits)
// that the Python layer turns into a RobotModel. Semantics mirror
// gridcodegenerator_tpu/topology/urdf.py exactly (BFS order with per-link
// name-sorted joints, fixed-joint lumping, joint-axis normalization), so the
// two front ends are interchangeable and cross-tested.
//
// C ABI (see runtime/native.py for the ctypes binding):
//   gct_topology_from_urdf(xml, floating, fbuf, fcap, ibuf, icap,
//                          names, ncap, fused, iused, nused) -> 0 on success
// Buffer layout is documented at the bottom of this file and in native.py.

#include <cctype>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// minimal XML parser (elements + attributes; skips comments/declarations)
// ---------------------------------------------------------------------------
struct XmlNode {
  std::string tag;
  std::map<std::string, std::string> attrs;
  std::vector<std::unique_ptr<XmlNode>> children;

  const XmlNode* find(const std::string& t) const {
    for (const auto& c : children)
      if (c->tag == t) return c.get();
    return nullptr;
  }
  std::vector<const XmlNode*> find_all(const std::string& t) const {
    std::vector<const XmlNode*> out;
    for (const auto& c : children)
      if (c->tag == t) out.push_back(c.get());
    return out;
  }
  std::string attr(const std::string& k, const std::string& dflt = "") const {
    auto it = attrs.find(k);
    return it == attrs.end() ? dflt : it->second;
  }
};

struct XmlParser {
  const char* p;
  const char* end;
  bool ok = true;

  explicit XmlParser(const std::string& s) : p(s.data()), end(s.data() + s.size()) {}

  void skip_ws() { while (p < end && std::isspace((unsigned char)*p)) ++p; }

  bool starts(const char* s) const {
    size_t l = std::strlen(s);
    return (size_t)(end - p) >= l && std::strncmp(p, s, l) == 0;
  }

  void skip_until(const char* s) {
    const char* q = std::strstr(p, s);
    p = q ? q + std::strlen(s) : end;
  }

  std::string name() {
    const char* s = p;
    while (p < end && (std::isalnum((unsigned char)*p) || *p == '_' ||
                       *p == '-' || *p == ':' || *p == '.'))
      ++p;
    return std::string(s, p);
  }

  std::unique_ptr<XmlNode> parse_element() {
    skip_ws();
    while (p < end) {
      if (starts("<?")) { skip_until("?>"); skip_ws(); continue; }
      if (starts("<!--")) { skip_until("-->"); skip_ws(); continue; }
      if (starts("<!")) { skip_until(">"); skip_ws(); continue; }
      break;
    }
    if (p >= end || *p != '<') { ok = false; return nullptr; }
    ++p;
    auto node = std::make_unique<XmlNode>();
    node->tag = name();
    // attributes
    for (;;) {
      skip_ws();
      if (p >= end) { ok = false; return nullptr; }
      if (starts("/>")) { p += 2; return node; }
      if (*p == '>') { ++p; break; }
      std::string key = name();
      skip_ws();
      if (p < end && *p == '=') ++p;
      skip_ws();
      if (p >= end || (*p != '"' && *p != '\'')) { ok = false; return nullptr; }
      char quote = *p++;
      const char* s = p;
      while (p < end && *p != quote) ++p;
      node->attrs[key] = std::string(s, p);
      if (p < end) ++p;
    }
    // children / text until closing tag
    for (;;) {
      skip_ws();
      if (p >= end) { ok = false; return nullptr; }
      if (starts("<!--")) { skip_until("-->"); continue; }
      if (starts("</")) {
        p += 2;
        name();
        skip_ws();
        if (p < end && *p == '>') ++p;
        return node;
      }
      if (*p == '<') {
        auto child = parse_element();
        if (!ok) return nullptr;
        node->children.push_back(std::move(child));
      } else {
        // text content: skip (URDF carries data in attributes)
        while (p < end && *p != '<') ++p;
      }
    }
  }
};

// ---------------------------------------------------------------------------
// small linear algebra (row-major 3x3 / 4x4 / 6x6)
// ---------------------------------------------------------------------------
using M3 = double[9];

void mat3_mul(const double* a, const double* b, double* out) {
  double t[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += a[3 * i + k] * b[3 * k + j];
      t[3 * i + j] = s;
    }
  std::memcpy(out, t, sizeof(t));
}

void mat3_identity(double* r) {
  static const double I[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  std::memcpy(r, I, sizeof(I));
}

void rot_axis(int axis, double th, double* r) {
  double c = std::cos(th), s = std::sin(th);
  mat3_identity(r);
  if (axis == 0) { r[4] = c; r[5] = -s; r[7] = s; r[8] = c; }
  else if (axis == 1) { r[0] = c; r[2] = s; r[6] = -s; r[8] = c; }
  else { r[0] = c; r[1] = -s; r[3] = s; r[4] = c; }
}

void rpy_to_R(const double rpy[3], double* r) {
  double rx[9], ry[9], rz[9], t[9];
  rot_axis(0, rpy[0], rx);
  rot_axis(1, rpy[1], ry);
  rot_axis(2, rpy[2], rz);
  mat3_mul(rz, ry, t);
  mat3_mul(t, rx, r);
}

void skew(const double p[3], double* s) {
  s[0] = 0;     s[1] = -p[2]; s[2] = p[1];
  s[3] = p[2];  s[4] = 0;     s[5] = -p[0];
  s[6] = -p[1]; s[7] = p[0];  s[8] = 0;
}

// spatial motion transform [[E,0],[-E*skew(p),E]] with E = R^T (6x6 row-major)
void xform_from_R_p(const double* R, const double p[3], double* X) {
  double E[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) E[3 * i + j] = R[3 * j + i];
  double sk[9], Es[9];
  skew(p, sk);
  mat3_mul(E, sk, Es);
  std::memset(X, 0, 36 * sizeof(double));
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      X[6 * i + j] = E[3 * i + j];
      X[6 * (i + 3) + (j + 3)] = E[3 * i + j];
      X[6 * (i + 3) + j] = -Es[3 * i + j];
    }
}

void hom_from_R_p(const double* R, const double p[3], double* T) {
  std::memset(T, 0, 16 * sizeof(double));
  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < 3; ++j) T[4 * i + j] = R[3 * i + j];
    T[4 * i + 3] = p[i];
  }
  T[15] = 1.0;
}

void hom_mul(const double* a, const double* b, double* out) {
  double t[16];
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) {
      double s = 0;
      for (int k = 0; k < 4; ++k) s += a[4 * i + k] * b[4 * k + j];
      t[4 * i + j] = s;
    }
  std::memcpy(out, t, sizeof(t));
}

// spatial inertia about the link origin (6x6 row-major, angular-first)
void spatial_inertia(double mass, const double com[3], const double* Icom,
                     double* I6) {
  double C[9], CT[9], CCT[9];
  skew(com, C);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) CT[3 * i + j] = C[3 * j + i];
  mat3_mul(C, CT, CCT);
  std::memset(I6, 0, 36 * sizeof(double));
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      I6[6 * i + j] = Icom[3 * i + j] + mass * CCT[3 * i + j];
      I6[6 * i + (j + 3)] = mass * C[3 * i + j];
      I6[6 * (i + 3) + j] = mass * CT[3 * i + j];
    }
  I6[6 * 3 + 3] = I6[6 * 4 + 4] = I6[6 * 5 + 5] = mass;
}

// I_parent += X^T I_child X with X built from T (child frame -> parent frame)
void merge_inertia(double* Ip, const double* T, const double* Ic) {
  double R[9], p[3];
  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < 3; ++j) R[3 * i + j] = T[4 * i + j];
    p[i] = T[4 * i + 3];
  }
  double X[36];
  xform_from_R_p(R, p, X);  // builds with E = R^T: parent -> child coords
  double XtI[36];
  for (int i = 0; i < 6; ++i)
    for (int j = 0; j < 6; ++j) {
      double s = 0;
      for (int k = 0; k < 6; ++k) s += X[6 * k + i] * Ic[6 * k + j];
      XtI[6 * i + j] = s;
    }
  for (int i = 0; i < 6; ++i)
    for (int j = 0; j < 6; ++j) {
      double s = 0;
      for (int k = 0; k < 6; ++k) s += XtI[6 * i + k] * X[6 * k + j];
      Ip[6 * i + j] += s;
    }
}

// ---------------------------------------------------------------------------
// URDF semantics (mirrors topology/urdf.py)
// ---------------------------------------------------------------------------
void parse_floats(const std::string& s, double* out, int k, const double* dflt) {
  if (s.empty()) {
    std::memcpy(out, dflt, k * sizeof(double));
    return;
  }
  const char* p = s.c_str();
  for (int i = 0; i < k; ++i) {
    char* q;
    out[i] = std::strtod(p, &q);
    p = q;
  }
}

void parse_origin(const XmlNode* e, double* R, double p[3]) {
  static const double z3[3] = {0, 0, 0};
  double rpy[3] = {0, 0, 0};
  p[0] = p[1] = p[2] = 0;
  const XmlNode* o = e ? e->find("origin") : nullptr;
  if (o) {
    parse_floats(o->attr("xyz"), p, 3, z3);
    parse_floats(o->attr("rpy"), rpy, 3, z3);
  }
  rpy_to_R(rpy, R);
}

void parse_inertial(const XmlNode* link, double& mass, double com[3],
                    double* Icom_link) {
  mass = 0;
  com[0] = com[1] = com[2] = 0;
  std::memset(Icom_link, 0, 9 * sizeof(double));
  const XmlNode* in = link->find("inertial");
  if (!in) return;
  const XmlNode* me = in->find("mass");
  if (me) mass = std::strtod(me->attr("value", "0").c_str(), nullptr);
  double R0[9];
  parse_origin(in, R0, com);
  const XmlNode* ie = in->find("inertia");
  double I[9] = {0, 0, 0, 0, 0, 0, 0, 0, 0};
  if (ie) {
    double ixx = std::strtod(ie->attr("ixx", "0").c_str(), nullptr);
    double iyy = std::strtod(ie->attr("iyy", "0").c_str(), nullptr);
    double izz = std::strtod(ie->attr("izz", "0").c_str(), nullptr);
    double ixy = std::strtod(ie->attr("ixy", "0").c_str(), nullptr);
    double ixz = std::strtod(ie->attr("ixz", "0").c_str(), nullptr);
    double iyz = std::strtod(ie->attr("iyz", "0").c_str(), nullptr);
    I[0] = ixx; I[1] = ixy; I[2] = ixz;
    I[3] = ixy; I[4] = iyy; I[5] = iyz;
    I[6] = ixz; I[7] = iyz; I[8] = izz;
  }
  // rotate com-frame inertia into link axes: R0 I R0^T
  double R0T[9], t[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) R0T[3 * i + j] = R0[3 * j + i];
  mat3_mul(R0, I, t);
  mat3_mul(t, R0T, Icom_link);
}

// axis -> (extra rotation with third column = axis, basis index) per urdf.py
int axis_to_frame(const double axis[3], double* R_extra) {
  double n = std::sqrt(axis[0] * axis[0] + axis[1] * axis[1] + axis[2] * axis[2]);
  double a[3] = {axis[0] / n, axis[1] / n, axis[2] / n};
  for (int k = 0; k < 3; ++k) {
    double e[3] = {0, 0, 0};
    e[k] = 1;
    if (std::fabs(a[0] - e[0]) < 1e-12 && std::fabs(a[1] - e[1]) < 1e-12 &&
        std::fabs(a[2] - e[2]) < 1e-12) {
      mat3_identity(R_extra);
      return k;
    }
  }
  double ref[3] = {1, 0, 0};
  if (std::fabs(a[0]) >= 0.9) { ref[0] = 0; ref[1] = 1; }
  double x[3] = {ref[1] * a[2] - ref[2] * a[1], ref[2] * a[0] - ref[0] * a[2],
                 ref[0] * a[1] - ref[1] * a[0]};
  double xn = std::sqrt(x[0] * x[0] + x[1] * x[1] + x[2] * x[2]);
  for (double& v : x) v /= xn;
  double y[3] = {a[1] * x[2] - a[2] * x[1], a[2] * x[0] - a[0] * x[2],
                 a[0] * x[1] - a[1] * x[0]};
  for (int i = 0; i < 3; ++i) {
    R_extra[3 * i + 0] = x[i];
    R_extra[3 * i + 1] = y[i];
    R_extra[3 * i + 2] = a[i];
  }
  return 2;
}

struct Movable {
  std::string name, parent_link, child_link;
  int parent_id;
  int jtype;  // 0 revolute, 1 prismatic
  int s_ind;
  double Xtree[36], Ttree[16], damping, lo, hi, effort, velocity, Imat[36];
};

struct Fixed {
  std::string name, parent_link, child_link;
  int parent_jid;
  double Ttree[16];
};

struct Robot {
  std::vector<Movable> joints;
  std::vector<Fixed> fixed;
  double base_inertia[36];
  std::string err;
};

bool build_robot(const XmlNode* root, Robot* out) {
  std::map<std::string, const XmlNode*> links;
  for (auto* l : root->find_all("link")) links[l->attr("name")] = l;
  std::map<std::string, std::vector<const XmlNode*>> child_of;
  std::map<std::string, bool> is_child;
  for (auto* j : root->find_all("joint")) {
    const XmlNode* pl = j->find("parent");
    const XmlNode* cl = j->find("child");
    if (!pl || !cl) { out->err = "joint missing parent/child"; return false; }
    child_of[pl->attr("link")].push_back(j);
    is_child[cl->attr("link")] = true;
  }
  std::string root_link;
  for (auto& kv : links)
    if (!is_child.count(kv.first)) {
      if (!root_link.empty()) { out->err = "multiple roots"; return false; }
      root_link = kv.first;
    }
  if (root_link.empty()) { out->err = "no root link"; return false; }

  // base inertia
  {
    double m, com[3], I[9];
    parse_inertial(links[root_link], m, com, I);
    spatial_inertia(m, com, I, out->base_inertia);
  }

  struct QItem {
    std::string link;
    int parent_jid;
    double T[16];
  };
  std::vector<QItem> queue;
  QItem q0;
  q0.link = root_link;
  q0.parent_jid = -1;
  std::memset(q0.T, 0, sizeof(q0.T));
  q0.T[0] = q0.T[5] = q0.T[10] = q0.T[15] = 1;
  queue.push_back(q0);

  for (size_t head = 0; head < queue.size(); ++head) {
    QItem item = queue[head];
    auto it = child_of.find(item.link);
    if (it == child_of.end()) continue;
    std::vector<const XmlNode*> js = it->second;
    std::sort(js.begin(), js.end(), [](const XmlNode* a, const XmlNode* b) {
      return a->attr("name") < b->attr("name");
    });
    for (const XmlNode* j : js) {
      std::string jtype = j->attr("type");
      std::string cl = j->find("child")->attr("link");
      double Rj[9], pj[3];
      parse_origin(j, Rj, pj);
      double To[16];
      hom_from_R_p(Rj, pj, To);
      if (jtype == "fixed") {
        Fixed f;
        f.name = j->attr("name");
        f.parent_jid = item.parent_jid;
        f.parent_link = item.link;
        f.child_link = cl;
        hom_mul(item.T, To, f.Ttree);
        out->fixed.push_back(f);
        // lump child inertia into the parent movable (or base)
        double m, com[3], I[9], I6[36];
        parse_inertial(links[cl], m, com, I);
        spatial_inertia(m, com, I, I6);
        double* Ip = (item.parent_jid == -1)
                         ? out->base_inertia
                         : out->joints[item.parent_jid].Imat;
        merge_inertia(Ip, out->fixed.back().Ttree, I6);
        QItem next;
        next.link = cl;
        next.parent_jid = item.parent_jid;
        std::memcpy(next.T, out->fixed.back().Ttree, sizeof(next.T));
        queue.push_back(next);
        continue;
      }
      if (jtype == "revolute" || jtype == "continuous" ||
          jtype == "prismatic") {
        static const double dfl_axis[3] = {1, 0, 0};
        double axis[3];
        const XmlNode* ax = j->find("axis");
        parse_floats(ax ? ax->attr("xyz") : "", axis, 3, dfl_axis);
        double R_extra[9];
        int ax_ind = axis_to_frame(axis, R_extra);
        int kind = (jtype == "prismatic") ? 1 : 0;
        Movable mj;
        mj.name = j->attr("name");
        mj.parent_link = item.link;
        mj.child_link = cl;
        mj.parent_id = item.parent_jid;
        mj.jtype = kind;
        mj.s_ind = kind == 1 ? 3 + ax_ind : ax_ind;
        // fold accumulated fixed transform + origin + axis normalization
        double R_total[9], t[9];
        double Racc[9], pacc[3];
        for (int i = 0; i < 3; ++i) {
          for (int k = 0; k < 3; ++k) Racc[3 * i + k] = item.T[4 * i + k];
          pacc[i] = item.T[4 * i + 3];
        }
        mat3_mul(Racc, Rj, t);
        mat3_mul(t, R_extra, R_total);
        double p_total[3];
        for (int i = 0; i < 3; ++i)
          p_total[i] = Racc[3 * i + 0] * pj[0] + Racc[3 * i + 1] * pj[1] +
                       Racc[3 * i + 2] * pj[2] + pacc[i];
        xform_from_R_p(R_total, p_total, mj.Xtree);
        hom_from_R_p(R_total, p_total, mj.Ttree);
        const XmlNode* dyn = j->find("dynamics");
        mj.damping = dyn ? std::strtod(dyn->attr("damping", "0").c_str(),
                                       nullptr) : 0.0;
        const XmlNode* lim = j->find("limit");
        mj.lo = -HUGE_VAL;
        mj.hi = HUGE_VAL;
        mj.effort = HUGE_VAL;
        mj.velocity = HUGE_VAL;
        if (lim) {
          if (jtype != "continuous") {
            std::string lo = lim->attr("lower"), hi = lim->attr("upper");
            if (!lo.empty()) mj.lo = std::strtod(lo.c_str(), nullptr);
            if (!hi.empty()) mj.hi = std::strtod(hi.c_str(), nullptr);
          }
          std::string ef = lim->attr("effort"), ve = lim->attr("velocity");
          // URDF uses effort="0" for "unenforced" (matches urdf.py)
          if (!ef.empty()) {
            double v = std::strtod(ef.c_str(), nullptr);
            if (v > 0) mj.effort = v;
          }
          if (!ve.empty()) {
            double v = std::strtod(ve.c_str(), nullptr);
            if (v > 0) mj.velocity = v;
          }
        }
        double m, com[3], I[9];
        parse_inertial(links[cl], m, com, I);
        // Axis normalization rotated the joint (= child link) frame by
        // R_extra (URDF coords = R_extra @ ours): re-express the child
        // inertia and all descendant origins in the rotated frame via
        // T_corr = hom(R_extra^T, 0) — matches topology/urdf.py.
        double I6[36];
        spatial_inertia(m, com, I, I6);
        bool rot = !(R_extra[0] == 1 && R_extra[4] == 1 && R_extra[8] == 1 &&
                     R_extra[1] == 0 && R_extra[2] == 0 && R_extra[3] == 0 &&
                     R_extra[5] == 0 && R_extra[6] == 0 && R_extra[7] == 0);
        double Tcorr[16];
        {
          double ReT[9];
          for (int i = 0; i < 3; ++i)
            for (int k = 0; k < 3; ++k) ReT[3 * i + k] = R_extra[3 * k + i];
          double zero3[3] = {0, 0, 0};
          hom_from_R_p(ReT, zero3, Tcorr);
        }
        if (rot) {
          std::memset(mj.Imat, 0, sizeof(mj.Imat));
          merge_inertia(mj.Imat, Tcorr, I6);
        } else {
          std::memcpy(mj.Imat, I6, sizeof(I6));
        }
        int jid = (int)out->joints.size();
        out->joints.push_back(mj);
        QItem next;
        next.link = cl;
        next.parent_jid = jid;
        std::memcpy(next.T, Tcorr, sizeof(Tcorr));
        queue.push_back(next);
        continue;
      }
      out->err = "unsupported joint type: " + jtype;
      return false;
    }
  }
  return true;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
//
// fbuf layout (float64):
//   [base_inertia 36]
//   per joint i in id order:
//     [Xtree 36][Ttree 16][Imat 36][damping][lo][hi][effort][velocity]
//   per fixed joint: [Ttree 16]
// ibuf layout (int64):
//   [n][nf]
//   per joint: [parent_id][jtype][s_ind]
//   per fixed: [parent_jid]
// names: '\n'-joined movable joint names, then fixed joint names.
// ---------------------------------------------------------------------------
extern "C" {

int gct_topology_from_urdf(const char* xml, double* fbuf, long fcap,
                           long long* ibuf, long icap, char* names, long ncap,
                           long* fused, long* iused, long* nused) {
  std::string src(xml);
  XmlParser parser(src);
  auto root = parser.parse_element();
  if (!parser.ok || !root || root->tag != "robot") return 1;
  Robot robot;
  if (!build_robot(root.get(), &robot)) return 2;

  long n = (long)robot.joints.size();
  long nf = (long)robot.fixed.size();
  long fneed = 36 + n * (36 + 16 + 36 + 5) + nf * 16;
  long ineed = 2 + n * 3 + nf;
  std::string allnames;
  for (auto& j : robot.joints) allnames += j.name + "\n";
  for (auto& f : robot.fixed) allnames += f.name + "\n";
  long nneed = (long)allnames.size() + 1;
  *fused = fneed;
  *iused = ineed;
  *nused = nneed;
  if (fneed > fcap || ineed > icap || nneed > ncap) return 3;

  double* f = fbuf;
  std::memcpy(f, robot.base_inertia, 36 * sizeof(double));
  f += 36;
  for (auto& j : robot.joints) {
    std::memcpy(f, j.Xtree, 36 * sizeof(double)); f += 36;
    std::memcpy(f, j.Ttree, 16 * sizeof(double)); f += 16;
    std::memcpy(f, j.Imat, 36 * sizeof(double)); f += 36;
    *f++ = j.damping;
    *f++ = j.lo;
    *f++ = j.hi;
    *f++ = j.effort;
    *f++ = j.velocity;
  }
  for (auto& fx : robot.fixed) {
    std::memcpy(f, fx.Ttree, 16 * sizeof(double));
    f += 16;
  }
  long long* ip = ibuf;
  *ip++ = n;
  *ip++ = nf;
  for (auto& j : robot.joints) {
    *ip++ = j.parent_id;
    *ip++ = j.jtype;
    *ip++ = j.s_ind;
  }
  for (auto& fx : robot.fixed) *ip++ = fx.parent_jid;
  std::memcpy(names, allnames.c_str(), allnames.size() + 1);
  return 0;
}

}  // extern "C"
